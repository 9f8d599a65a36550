from mmdti_tpu.ops.attention import (  # noqa: F401
    cross_attention_xla,
    merge_padding_into_bias,
    pair_bias_attention_xla,
)
