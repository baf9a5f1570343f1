from tpu_llm.parallel.mesh import make_mesh  # noqa: F401
from tpu_llm.parallel.sharding import (  # noqa: F401
    llama_param_specs,
    llama_cache_spec,
    llama_paged_state_spec,
    shard_pytree,
    unstack_param_specs,
)
