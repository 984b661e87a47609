from apex_studio_tpu.ops.attention import attention, attention_registry  # noqa: F401
from apex_studio_tpu.ops.rope import apply_rope, precompute_axial_freqs, rope_freqs_1d  # noqa: F401
from apex_studio_tpu.ops.norms import rms_norm, layer_norm, modulate, gate  # noqa: F401
from apex_studio_tpu.ops.embeddings import timestep_embedding  # noqa: F401
from apex_studio_tpu.ops.cfg import cfg_combine  # noqa: F401
