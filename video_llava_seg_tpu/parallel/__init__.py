from video_llava_seg_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    shard_params,
    named_sharding,
    replicated,
    with_sharding,
)
from video_llava_seg_tpu.parallel.collectives import (  # noqa: F401
    is_main_process,
    print_once,
    process_index,
    reduce_dict,
    synchronize,
)
