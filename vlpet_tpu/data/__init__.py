"""Data pipeline: feature readers, per-task datasets, fixed-shape collation,
multitask mixing, tokenization."""

from vlpet_tpu.data.tokenization import get_tokenizer, WhitespaceTokenizer
from vlpet_tpu.data.features import (
    DictFeatureSource,
    MonolithicH5Source,
    NpzVideoSource,
    PackedFeatureSource,
    PerImageH5Source,
    pack_features,
)
from vlpet_tpu.data.datasets import (
    Loader,
    TaskDataset,
    build_image_text_dataset,
    synthetic_task_data,
)
from vlpet_tpu.data.multitask import MultitaskLoader
