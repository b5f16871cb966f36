from fscl_tpu.data.batch import (
    Batch, BatchMeta, SupInfo, collate_batch, bucket_len, pad_1d, pad_2d,
)
from fscl_tpu.data.feature_store import (
    FeatureStore, read_queries_from_txt, write_queries_to_txt,
)
from fscl_tpu.data.datasets import (
    ConcatDataset, FSCLDataset, FastSpeech2Dataset, PRDataset, TextDataset,
    UnitDataset, segment_to_duration,
)
from fscl_tpu.data.episodic import (
    EpisodicSampler, InfiniteEpisodes, ReIdMapper, collate_episode,
    collate_sup_info, get_or_create_tasks, split_sup_qry,
)
