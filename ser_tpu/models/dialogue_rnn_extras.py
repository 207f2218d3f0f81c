"""DialogueRNN suite extras (ref ``model/DialogueRNN.py:279-705``).

The reference file carries several additional models beyond the trainer-used
BiModel: the unidirectional ``Model``, the regression ``AVECModel``, the
GloVe/CNN end-to-end variants (``E2EModel``/``BiE2EModel``), and the
``DailyDialogueModel`` with its text-CNN feature extractor. None is wired to
a trainer in the reference; they're provided here as working modules (the
reference's ``Model.forward`` even crashes as shipped — it drops the
DialogueRNN tuple; we return the working semantics).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ser_tpu.models.dialogue_rnn import (
    DialogueRNNScan,
    matching_attention_general2,
)
from ser_tpu.ops.cells import declare_linear
from ser_tpu.ops.layers import Dropout, TorchLinear
from ser_tpu.ops.masking import reverse_seq
from ser_tpu.ops.rnn import TorchGRU


class DialogueRNNModel(nn.Module):
    """Unidirectional ``Model`` (ref ``DialogueRNN.py:432-480``)."""

    D_m: int
    D_g: int
    D_p: int
    D_e: int
    D_h: int
    n_classes: int = 7
    listener_state: bool = False
    context_attention: str = "simple"
    dropout_rec: float = 0.5
    dropout: float = 0.5

    @nn.compact
    def __call__(self, U, qmask, umask=None, att2: bool = False,
                 deterministic: bool = True):
        emotions, _ = DialogueRNNScan(
            self.D_m, self.D_g, self.D_p, self.D_e, self.listener_state,
            self.dropout_rec, self.context_attention, name="dialog_rnn",
        )(U, qmask, deterministic)
        emotions = Dropout(self.dropout + 0.15, name="dropout_rec_mod")(
            emotions, deterministic)

        tk, tb = declare_linear(self, "matchatt_transform",
                                self.D_e, self.D_e)
        if att2:
            mask = umask if umask is not None else jnp.ones(
                (U.shape[1], U.shape[0]), U.dtype)
            att_emotions, _ = matching_attention_general2(
                emotions, emotions, mask, tk, tb)
            hidden = nn.relu(TorchLinear(self.D_h, name="linear1")(
                att_emotions))
        else:
            hidden = nn.relu(TorchLinear(self.D_h, name="linear1")(emotions))
        hidden = Dropout(self.dropout, name="drop")(hidden, deterministic)
        return jax.nn.log_softmax(
            TorchLinear(self.n_classes, name="smax_fc")(hidden), axis=2)


class AVECModel(nn.Module):
    """Regression head for AVEC attributes (ref ``DialogueRNN.py:482-515``):
    returns flat [B*L] predictions (batch-major)."""

    D_m: int
    D_g: int
    D_p: int
    D_e: int
    D_h: int
    attr: int = 1
    listener_state: bool = False
    context_attention: str = "simple"
    dropout_rec: float = 0.5
    dropout: float = 0.5

    @nn.compact
    def __call__(self, U, qmask, deterministic: bool = True):
        emotions, _ = DialogueRNNScan(
            self.D_m, self.D_g, self.D_p, self.D_e, self.listener_state,
            self.dropout_rec, self.context_attention, name="dialog_rnn",
        )(U, qmask, deterministic)
        emotions = Dropout(self.dropout, name="dropout_rec_mod")(
            emotions, deterministic)
        hidden = jnp.tanh(TorchLinear(self.D_h, name="linear")(emotions))
        hidden = Dropout(self.dropout, name="drop")(hidden, deterministic)
        pred = TorchLinear(1, name="smax_fc")(hidden)[..., 0]  # [L, B]
        return jnp.swapaxes(pred, 0, 1).reshape(-1)


class CNNFeatureExtractor(nn.Module):
    """Text CNN over token ids (ref ``DialogueRNN.py:564-601``):
    embedding -> parallel Conv1d(k=3,4,5) -> ReLU -> max-pool -> fc."""

    vocab_size: int
    embedding_dim: int = 300
    output_size: int = 100
    filters: int = 50
    kernel_sizes: tuple = (3, 4, 5)
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, umask, deterministic: bool = True):
        # x: [L, B, W] int token ids; umask: [B, L]
        L, B, W = x.shape
        emb_table = self.param(
            "embedding",
            lambda key, shape: jax.random.normal(key, shape),  # torch default
            (self.vocab_size, self.embedding_dim))
        emb = emb_table[x.reshape(-1, W)]  # [L*B, W, E]

        pooled = []
        for K in self.kernel_sizes:
            bound = 1.0 / (self.embedding_dim * K) ** 0.5
            kern = self.param(
                f"conv{K}_kernel",
                lambda key, shape, b=bound: jax.random.uniform(
                    key, shape, jnp.float32, -b, b),
                (K, self.embedding_dim, self.filters))
            bias = self.param(
                f"conv{K}_bias",
                lambda key, shape, b=bound: jax.random.uniform(
                    key, shape, jnp.float32, -b, b),
                (self.filters,))
            # valid conv over words: windows [W-K+1]
            conv = jax.lax.conv_general_dilated(
                emb, kern, window_strides=(1,), padding="VALID",
                dimension_numbers=("NWC", "WIO", "NWC")) + bias
            conv = nn.relu(conv)  # [L*B, W-K+1, filters]
            pooled.append(jnp.max(conv, axis=1))  # [L*B, filters]

        concated = jnp.concatenate(pooled, axis=1)
        concated = Dropout(self.dropout, name="drop")(concated, deterministic)
        features = nn.relu(TorchLinear(self.output_size, name="fc")(concated))
        features = features.reshape(L, B, self.output_size)
        return features * jnp.swapaxes(umask, 0, 1)[:, :, None]


class DailyDialogueModel(nn.Module):
    """CNN-features + bidirectional DialogueRNN
    (ref ``DialogueRNN.py:603-685``)."""

    D_m: int
    D_g: int
    D_p: int
    D_e: int
    D_h: int
    vocab_size: int
    n_classes: int = 7
    listener_state: bool = False
    context_attention: str = "simple"
    dropout_rec: float = 0.5
    dropout: float = 0.5
    att2: bool = True

    @nn.compact
    def __call__(self, input_seq, qmask, umask, deterministic: bool = True):
        U = CNNFeatureExtractor(self.vocab_size, name="cnn_feat_extractor")(
            input_seq, umask, deterministic)

        rnn_f = DialogueRNNScan(self.D_m, self.D_g, self.D_p, self.D_e,
                                self.listener_state, self.dropout_rec,
                                self.context_attention, name="dialog_rnn_f")
        rnn_r = DialogueRNNScan(self.D_m, self.D_g, self.D_p, self.D_e,
                                self.listener_state, self.dropout_rec,
                                self.context_attention, name="dialog_rnn_r")
        drop_rec = Dropout(self.dropout_rec, name="dropout_rec_mod")

        emotions_f, alpha_f = rnn_f(U, qmask, deterministic)
        emotions_f = drop_rec(emotions_f, deterministic)
        emotions_b, alpha_b = rnn_r(reverse_seq(U, umask),
                                    reverse_seq(qmask, umask), deterministic)
        emotions_b = drop_rec(reverse_seq(emotions_b, umask), deterministic)
        emotions = jnp.concatenate([emotions_f, emotions_b], axis=-1)

        tk, tb = declare_linear(self, "matchatt_transform",
                                2 * self.D_e, 2 * self.D_e)
        alpha = None
        if self.att2:
            att_emotions, alpha = matching_attention_general2(
                emotions, emotions, umask, tk, tb)
            hidden = nn.relu(TorchLinear(2 * self.D_h, name="linear")(
                att_emotions))
        else:
            hidden = nn.relu(TorchLinear(2 * self.D_h, name="linear")(
                emotions))
        hidden = Dropout(self.dropout, name="drop")(hidden, deterministic)
        log_prob = jax.nn.log_softmax(
            TorchLinear(self.n_classes, name="smax_fc")(hidden), axis=2)
        return log_prob, alpha, alpha_f, alpha_b


class E2EModel(nn.Module):
    """3-turn end-to-end model over word embeddings
    (ref ``DialogueRNN.py:372-431``): per-turn GRU encodings feed a
    unidirectional DialogueRNN; predicts one label for turn 3."""

    D_emb: int
    D_m: int
    D_g: int
    D_p: int
    D_e: int
    D_h: int
    n_classes: int = 7
    listener_state: bool = False
    context_attention: str = "simple"
    dropout_rec: float = 0.5
    dropout: float = 0.5

    @nn.compact
    def __call__(self, turn1, turn2, turn3, word_embeddings,
                 att2: bool = False, deterministic: bool = True):
        # turns: [W, B] int ids; word_embeddings: [V, D_emb]
        turn_rnn = TorchGRU(self.D_m, name="turn_rnn")
        hs = []
        for t in (turn1, turn2, turn3):
            emb = word_embeddings[t]  # [W, B, D_emb]
            _, h_last = turn_rnn(emb)
            hs.append(h_last)
        U = jnp.stack(hs, axis=0)  # [3, B, D_m]

        B = U.shape[1]
        qmask = jnp.broadcast_to(
            jnp.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])[:, None, :],
            (3, B, 2))

        emotions, _ = DialogueRNNScan(
            self.D_m, self.D_g, self.D_p, self.D_e, self.listener_state,
            self.dropout_rec, self.context_attention, name="dialog_rnn",
        )(U, qmask, deterministic)
        emotions = Dropout(self.dropout + 0.15, name="dropout_rec_mod")(
            emotions, deterministic)

        tk, tb = declare_linear(self, "matchatt_transform",
                                self.D_e, self.D_e)
        if att2:
            umask = jnp.ones((B, 3), U.dtype)
            att, _ = matching_attention_general2(
                emotions, emotions[-1:], umask, tk, tb)
            hidden = nn.relu(TorchLinear(self.D_h, name="linear1")(att[0]))
        else:
            hidden = nn.relu(TorchLinear(self.D_h, name="linear1")(
                emotions[-1]))
        hidden = Dropout(self.dropout, name="drop")(hidden, deterministic)
        return jax.nn.log_softmax(
            TorchLinear(self.n_classes, name="smax_fc")(hidden), axis=-1)


class BiE2EModel(nn.Module):
    """Bidirectional E2E variant with a trainable embedding table
    (ref ``DialogueRNN.py:279-370``)."""

    D_emb: int
    D_m: int
    D_g: int
    D_p: int
    D_e: int
    D_h: int
    vocab_size: int
    n_classes: int = 7
    listener_state: bool = False
    context_attention: str = "simple"
    dropout_rec: float = 0.5
    dropout: float = 0.5

    @nn.compact
    def __call__(self, turn1, turn2, turn3, att2: bool = False,
                 deterministic: bool = True):
        emb_table = self.param(
            "embedding", lambda key, shape: jax.random.normal(key, shape),
            (self.vocab_size, self.D_emb))
        turn_rnn = TorchGRU(self.D_m, name="turn_rnn")
        hs = []
        for t in (turn1, turn2, turn3):
            _, h_last = turn_rnn(emb_table[t])
            hs.append(h_last)
        U = jnp.stack(hs, axis=0)  # [3, B, D_m]
        B = U.shape[1]
        qmask = jnp.broadcast_to(
            jnp.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])[:, None, :],
            (3, B, 2))
        umask = jnp.ones((B, 3), U.dtype)

        rnn_f = DialogueRNNScan(self.D_m, self.D_g, self.D_p, self.D_e,
                                self.listener_state, self.dropout_rec,
                                self.context_attention, name="dialog_rnn_f")
        rnn_r = DialogueRNNScan(self.D_m, self.D_g, self.D_p, self.D_e,
                                self.listener_state, self.dropout_rec,
                                self.context_attention, name="dialog_rnn_r")
        drop_rec = Dropout(self.dropout, name="dropout_rec_mod")

        emotions_f, _ = rnn_f(U, qmask, deterministic)
        emotions_f = drop_rec(emotions_f, deterministic)
        emotions_b, _ = rnn_r(reverse_seq(U, umask),
                              reverse_seq(qmask, umask), deterministic)
        emotions_b = reverse_seq(emotions_b, umask)
        emotions = jnp.concatenate([emotions_f, emotions_b], axis=-1)
        emotions = drop_rec(emotions, deterministic)

        tk, tb = declare_linear(self, "matchatt_transform",
                                2 * self.D_e, 2 * self.D_e)
        if att2:
            att, _ = matching_attention_general2(
                emotions, emotions[-1:], umask, tk, tb)
            hidden = nn.relu(TorchLinear(self.D_h, name="linear1")(att[0]))
        else:
            hidden = nn.relu(TorchLinear(self.D_h, name="linear1")(
                emotions[-1]))
        return jax.nn.log_softmax(
            TorchLinear(self.n_classes, name="smax_fc")(hidden), axis=-1)
