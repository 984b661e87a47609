from apex_studio_tpu.manifest.loader import validate_and_normalize, load_manifest  # noqa: F401
from apex_studio_tpu.manifest.resolver import ManifestResolver, resolve_manifest_reference  # noqa: F401
