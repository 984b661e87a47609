from apex_studio_tpu.loaders.safetensors_io import load_safetensors, load_sharded_safetensors  # noqa: F401
from apex_studio_tpu.loaders.state_mapping import apply_state_dict, assign_by_path  # noqa: F401
from apex_studio_tpu.loaders.converters import converter_registry, convert_keys  # noqa: F401
