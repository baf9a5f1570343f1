from tpu_llm.io.gguf import GGUFFile, GGUFTensorInfo, write_gguf  # noqa: F401
