from emip_tpu.data.manifest import scan_pairs, scan_clips, frames_subdir
from emip_tpu.data.pipeline import (
    PairTrainLoader,
    PairEvalLoader,
    ClipLoader,
    load_pair_arrays,
)
from emip_tpu.data.synthetic import make_synthetic_video_root
