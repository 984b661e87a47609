"""apex_studio_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of Apex Studio's
inference backend (reference: totokunda/apex-studio, apps/api).

The package speaks the same apex/v1 manifest schema and the same HTTP/WebSocket
render-queue protocol as the reference so the Electron editor works unchanged,
but every compute path is a brand-new JAX program: jit-compiled denoise loops,
Pallas flash-attention kernels, Mesh/pjit sharding over ICI instead of
single-device offloading.

Layering (mirrors SURVEY.md §1, rebuilt TPU-first):
  L0 utils/registry      — paths, config store, progress, the registry primitive
  L1 ops/ quantize/      — attention registry, Pallas kernels, GGUF ingestion
  L1 parallel/           — Mesh construction + per-family sharding rules
  L2 models/ schedulers/ — DiT/VAE/text-encoder families, flow-matching samplers
  L3 engine/             — manifest-driven pipelines with jitted denoise loops
  L5 server/             — aiohttp HTTP/WS app on the reference wire protocol
  L6 cli                 — apex-engine-style process management
"""

__version__ = "0.1.0"
