"""Dataset assembly: I/O, fragments, splits, schedules, host batching.

Pure Python + NumPy (I/O-bound, host-side); device batching discipline lives in
:mod:`.loader`. Mirrors reference src/mpcg_wav2vec/datasets/__init__.py:3-31.
"""

from .cinc import build_fragments, cinc_dataset, read_split
from .fragments import Fragment, FragmentDataset, class_counts
from .generated import generated_fragments
from .generative import GenerativeDataset, GenRecord, cinc_generative_dataset
from .labels import (
    LABEL_SETS,
    balance_weights,
    index_to_label,
    label_set,
    label_to_index,
    num_classes,
)
from .loader import Batcher, pad_batch, prefetch_to_device
from .schedule import DatasetSpec, EvalSet, Schedule, SourceSpec, Stage, load_schedule
from .splits import SplitRatios, make_splits, make_splits_from_dirs, read_cinc_labels, write_splits
from .vest import VEST_CHANNEL_MAP, build_fragments as build_vest_fragments, vest_dataset
from . import heart_cycles, wfdb_io

__all__ = [
    "build_fragments",
    "cinc_dataset",
    "read_split",
    "Fragment",
    "FragmentDataset",
    "class_counts",
    "generated_fragments",
    "GenerativeDataset",
    "GenRecord",
    "cinc_generative_dataset",
    "LABEL_SETS",
    "balance_weights",
    "label_set",
    "label_to_index",
    "index_to_label",
    "num_classes",
    "Batcher",
    "pad_batch",
    "prefetch_to_device",
    "Schedule",
    "DatasetSpec",
    "EvalSet",
    "SourceSpec",
    "Stage",
    "load_schedule",
    "SplitRatios",
    "make_splits",
    "make_splits_from_dirs",
    "read_cinc_labels",
    "write_splits",
    "VEST_CHANNEL_MAP",
    "build_vest_fragments",
    "vest_dataset",
    "heart_cycles",
    "wfdb_io",
]
