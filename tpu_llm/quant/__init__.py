from tpu_llm.quant.blocks import (  # noqa: F401
    QK4_0,
    QK8_0,
    quantize_q4_0,
    dequantize_q4_0,
    quantize_q8_0,
    dequantize_q8_0,
    dequantize_q4_1,
)
