from libfm_tpu.parallel.mesh import make_mesh, fm_shardings
from libfm_tpu.parallel.sharded_sgd import ShardedSGDLearner, make_sharded_train_step
