from apex_studio_tpu.schedulers.base import scheduler_registry, create_scheduler  # noqa: F401
from apex_studio_tpu.schedulers.flow_match import (  # noqa: F401
    FlowMatchEulerDiscreteScheduler,
    FlowMatchDiscreteScheduler,
    FlowMatchPairScheduler,
    FlowMatchScheduler,
)
from apex_studio_tpu.schedulers.unipc import FlowUniPCMultistepScheduler  # noqa: F401
from apex_studio_tpu.schedulers.rectified_flow import RectifiedFlowScheduler  # noqa: F401
from apex_studio_tpu.schedulers.ddim import CogVideoXDDIMScheduler  # noqa: F401
from apex_studio_tpu.schedulers.magi import MagiScheduler  # noqa: F401
