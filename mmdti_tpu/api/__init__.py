from mmdti_tpu.api.train_api import MolTrain  # noqa: F401
from mmdti_tpu.api.predict_api import MolPredict  # noqa: F401
from mmdti_tpu.api.serve_api import MolServe  # noqa: F401
