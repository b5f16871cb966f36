from fscl_tpu.utils.tool import (
    expand, pad_1d_list, seed_all, ssl_match_length,
)
