from tpu_llm.models import llama  # noqa: F401
