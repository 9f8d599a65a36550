from mmdti_tpu.configs.config import (  # noqa: F401
    Config,
    YamlHandler,
    default_config,
    load_yaml,
    save_yaml,
)
from mmdti_tpu.configs.architectures import (  # noqa: F401
    ChemBertaConfig,
    CrossModalConfig,
    FDSConfig,
    UniMolEncoderConfig,
)
