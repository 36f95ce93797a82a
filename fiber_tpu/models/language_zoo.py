"""Additional language backbones: RNN (LSTM/GRU) encoder.

Behavioral spec: modeling/language_backbone/rnn_model.py (RNNEnoder):
embedding -> input dropout -> MLP to word_vec_size -> (bi)LSTM/GRU ->
per-token hidden states + final aggregate.  TPU redesign: the packed
variable-length sequences become masked lax.scan recurrences (flax
nn.RNN) — static shapes, no host-side sort/pack/unpack.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class RNNLanguageEncoder(nn.Module):
    vocab_size: int
    word_embedding_size: int = 300
    word_vec_size: int = 300
    hidden_size: int = 512
    n_layers: int = 1
    rnn_type: str = "lstm"        # lstm | gru
    bidirectional: bool = True
    input_dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array, mask: Optional[jax.Array]
                 = None, *, deterministic: bool = True) -> Dict[str, Any]:
        if mask is None:
            mask = (input_ids != 0).astype(jnp.int32)
        lengths = mask.sum(axis=1)

        x = nn.Embed(self.vocab_size, self.word_embedding_size,
                     dtype=self.dtype, name="embedding")(input_ids)
        x = nn.Dropout(self.input_dropout,
                       deterministic=deterministic)(x)
        embedded = nn.relu(nn.Dense(self.word_vec_size, dtype=self.dtype,
                                    name="mlp")(x))

        cell_cls = nn.GRUCell if self.rnn_type.lower() == "gru" \
            else nn.LSTMCell
        h = embedded
        outputs = h
        for layer in range(self.n_layers):
            fwd = nn.RNN(cell_cls(features=self.hidden_size,
                                  dtype=self.dtype),
                         name=f"rnn_fwd_{layer}")(
                h, seq_lengths=lengths)
            if self.bidirectional:
                bwd = nn.RNN(cell_cls(features=self.hidden_size,
                                      dtype=self.dtype), reverse=True,
                             keep_order=True,
                             name=f"rnn_bwd_{layer}")(
                    h, seq_lengths=lengths)
                h = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                h = fwd
            outputs = h

        maskf = mask.astype(jnp.float32)[..., None]
        aggregate = (outputs * maskf).sum(1) / jnp.maximum(
            maskf.sum(1), 1.0)
        # final_output: last valid fwd state (+ first bwd state), the
        # reference's hidden-state concat equivalent
        idx = jnp.maximum(lengths - 1, 0)
        final = jnp.take_along_axis(
            outputs, idx[:, None, None].repeat(outputs.shape[-1], -1),
            axis=1)[:, 0]
        return {"hidden": outputs, "embedded": embedded,
                "aggregate": aggregate, "final_output": final,
                "masks": mask}
