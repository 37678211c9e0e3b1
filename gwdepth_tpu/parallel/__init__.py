from gwdepth_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, place_replicated)
from gwdepth_tpu.parallel.partition import (  # noqa: F401
    param_shardings, place_params)
from gwdepth_tpu.parallel.train_state import (  # noqa: F401
    TrainState, create_train_state, make_optimizer, param_group_label)
from gwdepth_tpu.parallel.train_step import (  # noqa: F401
    make_train_step, make_eval_step, compute_losses)
