from apex_studio_tpu.training.lora import (  # noqa: F401
    LoraParams,
    init_lora,
    apply_lora_to_state,
    make_train_step,
    save_lora_safetensors,
)
