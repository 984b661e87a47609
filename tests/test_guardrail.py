"""Cosmos guardrail (reference src/postprocess/cosmos/guardrail.py):
classifier numerics vs a torch oracle, SigLIP MAP pooling head parity,
keyword blocklist, and the runner's block/pass flow."""

import numpy as np
import pytest
import jax.numpy as jnp
from flax import nnx

torch = pytest.importorskip("torch")


class TestSafetyClassifier:
    def test_matches_torch_oracle_with_running_stats(self):
        import torch.nn as nn

        from apex_studio_tpu.postprocess.guardrail import (
            SafetyClassifier, SafetyClassifierConfig)

        torch.manual_seed(0)
        oracle = nn.Sequential(
            nn.Linear(16, 512), nn.BatchNorm1d(512), nn.ReLU(),
            nn.Linear(512, 256), nn.BatchNorm1d(256), nn.ReLU(),
            nn.Linear(256, 7)).eval()
        # make running stats non-trivial
        with torch.no_grad():
            oracle[1].running_mean.uniform_(-1, 1)
            oracle[1].running_var.uniform_(0.5, 2.0)
            oracle[4].running_mean.uniform_(-1, 1)
            oracle[4].running_var.uniform_(0.5, 2.0)
        sd = {f"network.layers.{k}": v.detach().numpy()
              for k, v in oracle.state_dict().items()}
        clf = SafetyClassifier(SafetyClassifierConfig(input_size=16))
        clf.load_torch_state(sd)
        x = np.random.default_rng(0).normal(size=(3, 16)).astype(np.float32)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(clf(x), ref, atol=1e-4)


class TestSiglipMAPHead:
    def test_matches_torch_multihead_attention(self):
        import torch.nn as nn

        from apex_studio_tpu.models.text_encoders.siglip import (
            SiglipMAPHead, SiglipVisionConfig)

        d, heads = 32, 4
        cfg = SiglipVisionConfig(hidden_size=d, intermediate_size=64,
                                 num_attention_heads=heads)
        head = SiglipMAPHead(cfg, dtype=jnp.float32, param_dtype=jnp.float32,
                             rngs=nnx.Rngs(0))
        torch.manual_seed(1)
        attn = nn.MultiheadAttention(d, heads, batch_first=True).eval()
        ln = nn.LayerNorm(d, eps=cfg.layer_norm_eps).eval()
        fc1, fc2 = nn.Linear(d, 64), nn.Linear(64, d)
        probe = torch.randn(1, 1, d)

        head.probe.value = jnp.asarray(probe.numpy())
        head.in_proj_weight.value = jnp.asarray(attn.in_proj_weight.detach().numpy())
        head.in_proj_bias.value = jnp.asarray(attn.in_proj_bias.detach().numpy())
        head.out_proj.kernel.value = jnp.asarray(
            attn.out_proj.weight.detach().numpy().T)
        head.out_proj.bias.value = jnp.asarray(
            attn.out_proj.bias.detach().numpy())
        head.layernorm.weight.value = jnp.asarray(ln.weight.detach().numpy())
        head.layernorm.bias.value = jnp.asarray(ln.bias.detach().numpy())
        head.fc1.kernel.value = jnp.asarray(fc1.weight.detach().numpy().T)
        head.fc1.bias.value = jnp.asarray(fc1.bias.detach().numpy())
        head.fc2.kernel.value = jnp.asarray(fc2.weight.detach().numpy().T)
        head.fc2.bias.value = jnp.asarray(fc2.bias.detach().numpy())

        x = np.random.default_rng(2).normal(size=(2, 9, d)).astype(np.float32)
        with torch.no_grad():
            xt = torch.from_numpy(x)
            h = attn(probe.expand(2, -1, -1), xt, xt, need_weights=False)[0]
            res = h
            h = ln(h)
            import torch.nn.functional as F

            ref = (res + fc2(F.gelu(fc1(h), approximate="tanh")))[:, 0].numpy()
        out = np.asarray(head(jnp.asarray(x)))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestBlocklistAndRunner:
    def test_keyword_blocklist(self):
        from apex_studio_tpu.postprocess.guardrail import KeywordBlocklist

        bl = KeywordBlocklist(["forbidden", "two words"])
        assert bl.is_safe("a nice prompt")[0]
        assert not bl.is_safe("very Forbidden thing")[0]
        assert not bl.is_safe("contains two words here")[0]
        # substring of a longer word is NOT a whole-word hit
        assert bl.is_safe("unforbiddenish")[0]

    def test_runner_blocks_and_postprocesses(self):
        from apex_studio_tpu.postprocess.guardrail import (
            GuardrailRunner, pixelate_face)

        class Block:
            def is_safe(self, _):
                return False, "nope"

        class Pass:
            def is_safe(self, _):
                return True, "ok"

        class MarkPP:
            def postprocess(self, frames):
                return [f + 1 for f in frames]

        frames = [np.zeros((4, 4, 3), np.uint8)]
        safe, msg = GuardrailRunner([Pass(), Block()]).run_safety_check(frames)
        assert not safe and "BLOCK" in msg
        out = GuardrailRunner([], [MarkPP()]).postprocess(frames)
        assert out[0].max() == 1
        face = np.arange(64, dtype=np.uint8).reshape(8, 8)
        pix = pixelate_face(np.stack([face] * 3, -1), blocks=2)
        assert pix.shape == (8, 8, 3)
        assert len(np.unique(pix[..., 0])) <= 4

    def test_postprocessor_registry_and_block_flow(self):
        from apex_studio_tpu.postprocess import postprocessor_registry
        from apex_studio_tpu.postprocess.guardrail import (
            CosmosGuardrailPostprocessor)

        cls = postprocessor_registry.get("cosmos.guardrail")
        assert cls is CosmosGuardrailPostprocessor
        pp = cls(encoder=None)  # no encoder → pass-through safety
        frames = [np.full((8, 8, 3), 7, np.uint8)] * 2
        out = pp(frames)
        assert len(out) == 2
        assert pp.check_prompt("hello world")[0]
