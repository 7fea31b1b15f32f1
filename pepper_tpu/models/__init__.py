from .transducer import (
    TransducerConfig,
    init_transducer_params,
    transducer_apply,
    transducer_logits,
)
