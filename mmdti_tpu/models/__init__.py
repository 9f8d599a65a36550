from mmdti_tpu.models.mm_model import MMModel, build_model  # noqa: F401
from mmdti_tpu.models.unimol import UniMolEncoder, PairBiasEncoderLayer  # noqa: F401
from mmdti_tpu.models.chemberta import ChemBerta  # noqa: F401
from mmdti_tpu.models.crossmodal import (  # noqa: F401
    BertCrossAttentionLayer,
    BertCrossEncoder,
    CrossAttentionModel,
)
from mmdti_tpu.models.gaussian import GaussianLayer  # noqa: F401
from mmdti_tpu.models.layers import ClassificationHead, NonLinearHead  # noqa: F401
