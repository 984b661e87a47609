"""Engine family x model-type matrix vs SURVEY.md Appendix C (the reference's
src/engine/<family>/<model_type>.py census). Pins registry coverage so a
refactor can't silently drop a model type."""

from apex_studio_tpu.engine.registry import _ensure_families_loaded, engine_registry

# (family, required model types) — the reference matrix, expressed in our
# registry's keys. Types covered by a different spelling are noted inline.
MATRIX = {
    "wan": {"t2v", "i2v", "t2i", "v2v", "inp", "fflf", "vace", "fun",
            "fun_control", "fun_vace", "phantom", "recam", "ati", "s2v",
            "multitalk", "humo", "mova", "ovi", "lynx", "animate", "scail",
            "causal", "apex_framepack", "svi", "holocine"},
    "flux": {"t2i", "fill", "kontext", "control", "dreamomni2"},
    "flux2": {"ti2i", "klein", "control"},
    "qwenimage": {"t2i", "edit", "edit_plus", "controlnet"},
    "zimage": {"t2i", "control"},
    "hunyuanvideo": {"t2v", "i2v", "framepack", "avatar"},
    "hunyuanvideo15": {"t2v", "i2v"},
    "ltx2": {"ti2v", "ic_lora", "keyframe_interpolation",
             "multimodal_guidance"},
    "longcat": {"t2v", "i2v", "vc", "continuation", "long_video",
                "interactive", "refine"},
    "magi": {"t2v", "i2v", "v2v"},
    "cogvideo": {"t2v", "i2v", "inp", "control"},
    "skyreels": {"t2v", "i2v", "df"},
    "stepvideo": {"t2v", "i2v"},
    "kandinsky5": {"t2v"},
    "cosmos2": {"i2v", "v2v"},  # video2world = image/video conditioned
    "hidream": {"t2i", "edit"},
    "chroma": {"t2i"},
    "hunyuanimage": {"t2i"},
    "hunyuanimage3": {"t2i"},
    "ovis": {"t2i"},
    "fibo": {"ti2i"},
    "mochi": {"t2v"},
    "lucy": {"edit"},
    "seedvr": {"upscale"},
    "flashvsr": {"upscale"},
    "ltx": {"x2v"},
}


def test_appendix_c_matrix_registered():
    _ensure_families_loaded()
    have = {}
    for eng, mt in engine_registry:
        have.setdefault(eng, set()).add(mt)
    missing = {}
    for fam, types in MATRIX.items():
        gap = types - have.get(fam, set())
        if gap:
            missing[fam] = sorted(gap)
    assert not missing, missing
    assert len(have) >= 26
