"""BiLSTM baseline (ref ``/root/reference/model/lstm.py:40-94``).

Per-modality encoder -> bidirectional LSTM (text 128, audio 16) -> concat ->
MLP head ending in Softmax (probabilities, not log-probs — the CE loss path
applies log-softmax on top, matching the trained behavior).

Note the reference's forward takes only ``x`` while the live trainer calls
``model(x, qmask, umask)`` (a latent TypeError in the reference as shipped);
we accept and ignore the masks so the model is actually usable.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ser_tpu.ops.encoder import EncoderLayer
from ser_tpu.ops.layers import Dropout, TorchLinear
from ser_tpu.ops.rnn import TorchBiLSTM


class BiLSTM(nn.Module):
    n_classes: int = 6
    d_l: int = 100
    d_a: int = 100
    dh_l: int = 128
    dh_a: int = 16

    @nn.compact
    def __call__(self, x, qmask=None, umask=None, deterministic: bool = True):
        x_l = jnp.swapaxes(x[:, :, : self.d_l], 0, 1)
        x_a = jnp.swapaxes(x[:, :, self.d_l : self.d_l + self.d_a], 0, 1)
        x_l, _ = EncoderLayer(100, 50, 8, 40, 40, name="encoder_l")(
            x_l, deterministic=deterministic)
        x_a, _ = EncoderLayer(100, 50, 8, 40, 40, name="encoder_a")(
            x_a, deterministic=deterministic)
        x_l = jnp.swapaxes(x_l, 0, 1)  # [L, B, 100]
        x_a = jnp.swapaxes(x_a, 0, 1)

        y_l = TorchBiLSTM(self.dh_l, name="lstm_l")(x_l)  # [L, B, 256]
        y_a = TorchBiLSTM(self.dh_a, name="lstm_a")(x_a)  # [L, B, 32]

        all_hs = jnp.swapaxes(jnp.concatenate([y_l, y_a], axis=2), 0, 1)
        all_hs = all_hs.reshape(-1, all_hs.shape[-1])  # [B*L, 288]

        out = TorchLinear(32, name="nn_out_0")(all_hs)
        out = nn.relu(out)
        out = Dropout(0.0, name="nn_out_drop")(out, deterministic)
        out = TorchLinear(self.n_classes, name="nn_out_3")(out)
        out = nn.softmax(out, axis=-1)  # probabilities (ref lstm.py:62)
        return out, x_l, x_a
