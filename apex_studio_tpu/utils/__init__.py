from apex_studio_tpu.utils.defaults import (  # noqa: F401
    APEX_HOME_DIR,
    get_cache_path,
    get_components_path,
    get_lora_path,
    get_results_path,
    get_manifest_search_paths,
)
from apex_studio_tpu.utils.progress import ProgressReporter, safe_emit_progress, make_mapped_progress  # noqa: F401
