from aclgan_tpu.eval.fid import compute_fid, frechet_distance  # noqa: F401
from aclgan_tpu.eval.inception import InceptionScorer, InceptionV3  # noqa: F401
