from .decode_cache import CachedImageSource, build_cache
from .pipeline import (
    FileImageSource,
    FlatTrainLoader,
    GroupBatch,
    GroupedTestLoader,
    GroupedTrainLoader,
    Prefetcher,
    SyntheticImageSource,
    kshot_subsample,
    load_manifest,
)
from .transforms import CLIP_MEAN, CLIP_STD, preprocess_pil

__all__ = [
    "CachedImageSource",
    "build_cache",
    "FileImageSource",
    "FlatTrainLoader",
    "GroupBatch",
    "GroupedTestLoader",
    "GroupedTrainLoader",
    "Prefetcher",
    "SyntheticImageSource",
    "kshot_subsample",
    "load_manifest",
    "preprocess_pil",
    "CLIP_MEAN",
    "CLIP_STD",
]
