from fscl_tpu.eval.metrics import (
    expand, fer_over_infos, frame_error_rate, levenshtein,
    mel_cepstral_distortion, per_over_infos, segment2duration, wer,
)
from fscl_tpu.eval.dpdp import dpdp_decode, dpdp_segment_to_time, merge_repeats
