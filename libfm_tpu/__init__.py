"""libfm_tpu: a TPU-native factorization machine framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of libFM
(reference: srendle/libfm): second-order factorization machines trained by
mini-batch SGD, adaptive-regularization SGD (SGDA), alternating least
squares (ALS) and MCMC Gibbs sampling with hierarchical hyperpriors, over
sparse feature data, plus the relational block-structure (BS) extension.

Everything on the compute path is expressed as batched, statically-shaped
JAX programs (gathers + segment-sums + the O(k*nnz) pairwise-interaction
trick), shardable over a (data, model) device mesh with XLA collectives.

Reference parity notes are cited as `/root/reference/<path>:<line>` in
docstrings throughout.
"""

__version__ = "0.1.0"

from libfm_tpu.data.dataset import Dataset, DataMetaInfo
from libfm_tpu.models.fm import FMParams, FMConfig, init_fm, fm_batch_predict
from libfm_tpu.learners.sgd import SGDLearner
from libfm_tpu.learners.sgda import SGDALearner
from libfm_tpu.learners.mcmc import MCMCLearner, ALSLearner
from libfm_tpu.tasks import TASK_REGRESSION, TASK_CLASSIFICATION

__all__ = [
    "Dataset",
    "DataMetaInfo",
    "FMParams",
    "FMConfig",
    "init_fm",
    "fm_batch_predict",
    "SGDLearner",
    "SGDALearner",
    "MCMCLearner",
    "ALSLearner",
    "TASK_REGRESSION",
    "TASK_CLASSIFICATION",
]
