"""Convert reference PyTorch checkpoints to pepper_tpu param pytrees.

The reference saves checkpoints as
  {'model_state_dict': ..., 'model_optimizer': ..., 'hidden_size': int,
   'gru_layers': int, 'epochs': int}
(pepper_variant/.../models/train_distributed.py:36-42), with LSTM weights
under keys encoder.weight_ih_l0 / weight_hh_l0 / bias_ih_l0 / bias_hh_l0
(+ _reverse) and Linear weights under linear_N.weight / .bias.  A leading
'module.' prefix may be present when saved from DataParallel
(ModelHander.py:30-41) — it is stripped here.

torch stores LSTM weight_ih_l0 as (4H, F) with gate order (i, f, g, o); we
store the transpose (F, 4H) for right-multiplication and pre-sum the two
bias vectors (mathematically identical).
"""

from __future__ import annotations

import numpy as np


def _strip_module_prefix(state_dict):
    out = {}
    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        out[key] = value
    return out


def _to_numpy(tensor):
    if hasattr(tensor, "detach"):
        return tensor.detach().cpu().numpy()
    return np.asarray(tensor)


def _convert_lstm(sd, prefix):
    return {
        "w_ih_f": _to_numpy(sd[f"{prefix}.weight_ih_l0"]).T.copy(),
        "w_hh_f": _to_numpy(sd[f"{prefix}.weight_hh_l0"]).T.copy(),
        "b_f": (_to_numpy(sd[f"{prefix}.bias_ih_l0"])
                + _to_numpy(sd[f"{prefix}.bias_hh_l0"])),
        "w_ih_b": _to_numpy(sd[f"{prefix}.weight_ih_l0_reverse"]).T.copy(),
        "w_hh_b": _to_numpy(sd[f"{prefix}.weight_hh_l0_reverse"]).T.copy(),
        "b_b": (_to_numpy(sd[f"{prefix}.bias_ih_l0_reverse"])
                + _to_numpy(sd[f"{prefix}.bias_hh_l0_reverse"])),
    }


def _convert_gru(sd, prefix):
    return {
        "w_ih_f": _to_numpy(sd[f"{prefix}.weight_ih_l0"]).T.copy(),
        "w_hh_f": _to_numpy(sd[f"{prefix}.weight_hh_l0"]).T.copy(),
        "b_ih_f": _to_numpy(sd[f"{prefix}.bias_ih_l0"]),
        "b_hh_f": _to_numpy(sd[f"{prefix}.bias_hh_l0"]),
        "w_ih_b": _to_numpy(sd[f"{prefix}.weight_ih_l0_reverse"]).T.copy(),
        "w_hh_b": _to_numpy(sd[f"{prefix}.weight_hh_l0_reverse"]).T.copy(),
        "b_ih_b": _to_numpy(sd[f"{prefix}.bias_ih_l0_reverse"]),
        "b_hh_b": _to_numpy(sd[f"{prefix}.bias_hh_l0_reverse"]),
    }


def _convert_linear(sd, prefix):
    return {
        "w": _to_numpy(sd[f"{prefix}.weight"]).T.copy(),
        "b": _to_numpy(sd[f"{prefix}.bias"]),
    }


def transducer_params_from_state_dict(state_dict):
    """Torch TransducerGRU state_dict -> pepper_tpu transducer params."""
    sd = _strip_module_prefix(state_dict)
    params = {
        "encoder": _convert_lstm(sd, "encoder"),
        "decoder": _convert_lstm(sd, "decoder"),
    }
    for name in ("linear_1", "linear_2", "linear_3", "linear_4", "linear_5",
                 "output_layer_type"):
        params[name] = _convert_linear(sd, name)
    return params


# the reference polish model names its modules gru_encoder / gru_decoder /
# dense1 (pepper/modules/python/models/simple_model.py:12-25); accept those
# alongside the short names used by locally-saved state dicts
_POLISH_KEY_ALIASES = {"gru_encoder": "encoder", "gru_decoder": "decoder",
                       "dense1": "linear"}


def polish_params_from_state_dict(state_dict):
    """Torch polish TransducerGRU (true GRU) state_dict -> params."""
    sd = {}
    for key, value in _strip_module_prefix(state_dict).items():
        head, dot, rest = key.partition(".")
        sd[f"{_POLISH_KEY_ALIASES.get(head, head)}{dot}{rest}"] = value
    return {
        "encoder": _convert_gru(sd, "encoder"),
        "decoder": _convert_gru(sd, "decoder"),
        "output": _convert_linear(sd, "linear"),
    }


def load_reference_checkpoint(path):
    """Load a reference .pkl checkpoint (torch.save dict) -> (params, meta)."""
    import torch

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = checkpoint["model_state_dict"]
    params = transducer_params_from_state_dict(state_dict)
    meta = {
        "hidden_size": checkpoint.get("hidden_size"),
        "gru_layers": checkpoint.get("gru_layers"),
        "epochs": checkpoint.get("epochs"),
    }
    return params, meta
