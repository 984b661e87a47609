from apex_studio_tpu.postprocess.base import BasePostprocessor, postprocessor_registry  # noqa: F401
from apex_studio_tpu.postprocess import interpolate  # noqa: F401  (registration)
from apex_studio_tpu.postprocess import rife  # noqa: F401  (registration)
from apex_studio_tpu.postprocess import guardrail  # noqa: F401  (registration)
