from .transducer import (
    TransducerConfig,
    init_transducer_params,
    transducer_apply,
    transducer_logits,
)
from .alternates import (
    NoCnnConfig,
    Seq2SeqConfig,
    TransformerConfig,
    init_no_cnn_params,
    init_seq2seq_params,
    init_transformer_params,
    no_cnn_apply,
    resnet_apply,
    seq2seq_decode_step,
    seq2seq_encode,
    transformer_apply,
)
