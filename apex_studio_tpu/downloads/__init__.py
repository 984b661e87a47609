from apex_studio_tpu.downloads.api import download_file, download_lora, is_downloaded  # noqa: F401
