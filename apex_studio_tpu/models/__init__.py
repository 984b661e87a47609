from apex_studio_tpu.models.registry import transformer_registry, vae_registry, text_encoder_registry  # noqa: F401
