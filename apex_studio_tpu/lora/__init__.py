from apex_studio_tpu.lora.manager import LoraManager, LoraSpec  # noqa: F401
from apex_studio_tpu.lora.convert import detect_lora_format, lora_pairs_from_state_dict  # noqa: F401
