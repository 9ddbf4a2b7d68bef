from .tokenizer import ClipTokenizer, get_tokenizer
from .augment import build_common_augmentation, mocov2_single, onecrop
from .pipeline import (
    DataInfo,
    get_neg_wds_dataset,
    get_unshuffled_wds_dataset,
    get_wds_dataset,
    prefetch_to_device,
)
from .shards import (
    detshuffle,
    expand_shard_pattern,
    iter_tar_samples,
    sample_shard_paths,
    split_shards,
    write_tar_shard,
)
from .synthetic import DummyDataset, SyntheticClipData
