from libfm_tpu.data.dataset import Dataset, DataMetaInfo
from libfm_tpu.data.batching import BatchedCSR, batch_dataset
from libfm_tpu.data.relation import RelationData, RelationJoin

__all__ = [
    "Dataset",
    "DataMetaInfo",
    "BatchedCSR",
    "batch_dataset",
    "RelationData",
    "RelationJoin",
]
