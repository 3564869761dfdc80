from pdc_tpu.parallel.distributed import (
    ensure_initialized,
    local_scene_subset,
    process_info,
)
from pdc_tpu.parallel.mesh import make_mesh
from pdc_tpu.parallel.pipeline import (
    make_pp_inference,
    make_pp_train_step,
    pack_pipeline_variables,
    unpack_pipeline_variables,
)
from pdc_tpu.parallel.sharded_train import make_sharded_train_step, shard_host_batch
from pdc_tpu.parallel.tensor_parallel import (
    channel_shardings,
    fsdp_shardings,
    make_fsdp_train_step,
    make_tp_inference,
    make_tp_train_step,
)
