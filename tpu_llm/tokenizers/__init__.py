from tpu_llm.tokenizers.bpe import BPETokenizer  # noqa: F401
from tpu_llm.tokenizers.tokenizer_bin import (  # noqa: F401
    read_tokenizer_bin,
    write_tokenizer_bin,
)
