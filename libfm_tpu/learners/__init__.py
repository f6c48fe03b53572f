from libfm_tpu.learners.sgd import SGDLearner
from libfm_tpu.learners.sgda import SGDALearner
from libfm_tpu.learners.mcmc import ALSLearner, MCMCLearner

__all__ = ["SGDLearner", "SGDALearner", "MCMCLearner", "ALSLearner"]
