"""Model family registries (counterpart of transformer/base.py:6 etc. in the reference).

Keys match manifest ``base`` values: ``zimage.base``, ``wan.base``, ``flux.base``,
``auto`` (AutoencoderKL), ``Qwen3ForCausalLM``…
"""

from apex_studio_tpu.registry import Registry

transformer_registry = Registry("transformer")
vae_registry = Registry("vae")
text_encoder_registry = Registry("text_encoder")
helper_registry = Registry("helper")


def _load_builtin_families() -> None:
    """Import every bundled family so registration side effects run."""
    import importlib

    for mod in (
        "apex_studio_tpu.models.transformers.zimage",
        "apex_studio_tpu.models.transformers.flux",
        "apex_studio_tpu.models.transformers.wan",
        "apex_studio_tpu.models.transformers.qwenimage",
        "apex_studio_tpu.models.transformers.hunyuanvideo15",
        "apex_studio_tpu.models.transformers.ltx",
        "apex_studio_tpu.models.transformers.chroma",
        "apex_studio_tpu.models.transformers.cogvideox",
        "apex_studio_tpu.models.vaes.cogvideox_vae",
        "apex_studio_tpu.models.transformers.mochi",
        "apex_studio_tpu.models.vaes.mochi_vae",
        "apex_studio_tpu.models.vaes.autoencoder_kl",
        "apex_studio_tpu.models.vaes.wan_vae",
        "apex_studio_tpu.models.text_encoders.qwen3",
        "apex_studio_tpu.models.text_encoders.qwen2",
        "apex_studio_tpu.models.text_encoders.t5",
        "apex_studio_tpu.models.text_encoders.clip",
        "apex_studio_tpu.models.text_encoders.clip_vision",
        "apex_studio_tpu.models.text_encoders.siglip",
        "apex_studio_tpu.models.vaes.hunyuanvideo15_vae",
        "apex_studio_tpu.models.vaes.ltx_vae",
        "apex_studio_tpu.models.transformers.hunyuanvideo",
        "apex_studio_tpu.models.vaes.hunyuanvideo_vae",
        "apex_studio_tpu.models.text_encoders.llama",
        "apex_studio_tpu.models.transformers.flux2",
        "apex_studio_tpu.models.transformers.magi",
        "apex_studio_tpu.models.transformers.ltx2",
        "apex_studio_tpu.models.transformers.wan_framepack",
        "apex_studio_tpu.models.transformers.kandinsky5",
        "apex_studio_tpu.models.transformers.cosmos",
        "apex_studio_tpu.models.transformers.hunyuanimage3",
        "apex_studio_tpu.models.transformers.hidream",
        "apex_studio_tpu.models.transformers.seedvr",
        "apex_studio_tpu.models.transformers.flashvsr",
        "apex_studio_tpu.models.transformers.hunyuanvideo_framepack",
        "apex_studio_tpu.models.vaes.seedvr_vae",
        "apex_studio_tpu.models.vaes.tae_vae",
        "apex_studio_tpu.models.vaes.mmaudio_vae",
        "apex_studio_tpu.models.transformers.stepvideo",
        "apex_studio_tpu.models.vaes.stepvideo_vae",
        "apex_studio_tpu.models.text_encoders.step_llm",
        "apex_studio_tpu.models.transformers.wan_ovi",
        "apex_studio_tpu.models.vaes.ltx2_vae",
        "apex_studio_tpu.models.vaes.ltx2_audio_vae",
        "apex_studio_tpu.models.ltx2_vocoder",
        "apex_studio_tpu.models.ltx2_upsampler",
        "apex_studio_tpu.models.transformers.wan_mova",
        "apex_studio_tpu.models.transformers.hunyuanvideo_avatar",
        "apex_studio_tpu.models.vaes.mova_audio_vae",
        "apex_studio_tpu.models.text_encoders.gemma3",
        "apex_studio_tpu.models.vaes.magi_vae",
        "apex_studio_tpu.models.transformers.hunyuanimage",
        "apex_studio_tpu.models.vaes.hunyuanimage_vae",
        "apex_studio_tpu.models.vaes.hunyuanimage3_vae",
        "apex_studio_tpu.models.transformers.ovis",
        "apex_studio_tpu.models.transformers.fibo",
        "apex_studio_tpu.models.transformers.longcat",
        "apex_studio_tpu.models.audio.wav2vec2",
        "apex_studio_tpu.models.transformers.wan_s2v",
        "apex_studio_tpu.models.transformers.wan_multitalk",
        "apex_studio_tpu.models.transformers.wan_animate",
        "apex_studio_tpu.models.transformers.wan_humo",
        "apex_studio_tpu.models.transformers.wan_lynx",
        "apex_studio_tpu.models.transformers.wan_scail",
    ):
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            pass  # family not built yet — registries stay partial during bring-up
