from apex_studio_tpu.preprocess.base import BasePreprocessor, preprocessor_registry, run_preprocessor  # noqa: F401
from apex_studio_tpu.preprocess import basic  # noqa: F401  (registration side effects)
from apex_studio_tpu.preprocess import basic2  # noqa: F401
from apex_studio_tpu.preprocess import basic3  # noqa: F401
from apex_studio_tpu.preprocess import teed  # noqa: F401
from apex_studio_tpu.preprocess import u2net  # noqa: F401
from apex_studio_tpu.preprocess import hed  # noqa: F401
from apex_studio_tpu.preprocess import lineart_model  # noqa: F401
from apex_studio_tpu.preprocess import pidinet  # noqa: F401
from apex_studio_tpu.preprocess import depth_anything  # noqa: F401
from apex_studio_tpu.preprocess import openpose  # noqa: F401
from apex_studio_tpu.preprocess import dwpose  # noqa: F401
from apex_studio_tpu.preprocess import mlsd  # noqa: F401
from apex_studio_tpu.preprocess import manga_line  # noqa: F401
from apex_studio_tpu.preprocess import depth_hf  # noqa: F401
from apex_studio_tpu.preprocess import segmentation  # noqa: F401
from apex_studio_tpu.preprocess import unimatch  # noqa: F401
from apex_studio_tpu.preprocess import lineart_anime  # noqa: F401
from apex_studio_tpu.preprocess import anime_seg  # noqa: F401
from apex_studio_tpu.preprocess import pose2d  # noqa: F401
from apex_studio_tpu.preprocess import normalbae  # noqa: F401
from apex_studio_tpu.preprocess import dsine  # noqa: F401
from apex_studio_tpu.preprocess import metric3d  # noqa: F401
from apex_studio_tpu.preprocess import leres  # noqa: F401
