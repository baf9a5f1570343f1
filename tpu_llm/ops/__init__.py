from tpu_llm.ops.norms import rmsnorm, layernorm  # noqa: F401
from tpu_llm.ops.rope import rope_angles, apply_rope  # noqa: F401
from tpu_llm.ops.activations import silu, softplus, gelu  # noqa: F401
from tpu_llm.ops.sampling import sample_token, greedy, masked_softmax  # noqa: F401
