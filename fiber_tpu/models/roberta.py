"""RoBERTa text encoder with text->image (t2i) fusion hooks, in flax.

Behavioral spec: coarse_grained/fiber/modules/roberta.py (a transformers-4.6
RoBERTa fork).  Parity-critical quirks reproduced here:

* Position ids are derived from input ids with a pad offset:
  pos = cumsum(ids != pad) * (ids != pad) + pad_idx
  (ref: roberta.py:877-888 create_position_ids_from_input_ids).
* Post-LN layer with the fusion gate inserted *before* the attention
  residual+LayerNorm:
    a   = SelfOut(SelfAttn(h))                 # dense+dropout, NO norm
    a   = alpha_t2i * CrossOut(CrossAttn(a, img)) + a   (fused layers only)
    a   = LN_attn(a + h)
    out = a + Drop(Dense(GELU(Dense(a))))
    out = LN_out(out)    # skipped when last_norm=False
  (ref: roberta.py:427-505 RobertaLayer.forward).
* Cross-attention K/V input dims depend on layer index: layers < 10 read
  stage-3 image features (DIM_IMG/2 = 512), layers >= 10 read stage-4
  features (DIM_IMG = 1024) (ref: roberta.py:232-241).
* Additive attention masks use -10000 for padding (transformers 4.6
  get_extended_attention_mask), and the captioning causal mask combines
  -inf causal with finfo.min padding (ref: roberta.py:891-938).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fiber_tpu.models.layers import bert_normal_init

Dtype = Any

NEG_INF = -1e9


def create_position_ids(input_ids: jax.Array, padding_idx: int) -> jax.Array:
    mask = (input_ids != padding_idx).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + padding_idx


def extended_attention_mask(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(B, L) 0/1 -> (B, 1, 1, L) additive (0 kept / -10000 masked)."""
    return ((1.0 - mask.astype(jnp.float32)) * -10000.0).astype(dtype)[
        :, None, None, :]


def make_lang_dict(text: jax.Array, masks) -> dict:
    """Language feature dict {hidden, embedded, aggregate, masks}
    (ref roberta_fused_model_v2.py:86-100): embedded = mask-zeroed
    hidden, aggregate = masked mean.  Shared by every language-aware
    backbone (fusion_backbone, swin_vl)."""
    if masks is None:
        masks = jnp.ones(text.shape[:2], jnp.int32)
    mf = masks.astype(jnp.float32)[..., None]
    embedded = text * mf.astype(text.dtype)
    aggregate = embedded.sum(axis=1) / jnp.maximum(
        mf.sum(axis=1), 1.0).astype(text.dtype)
    return {"hidden": text, "embedded": embedded,
            "aggregate": aggregate, "masks": masks}


def causal_attention_mask(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(B, L) 0/1 -> (B, 1, L, L) additive causal+padding mask.

    Matches _prepare_decoder_attention_mask semantics: causal upper triangle
    blocked, padded key positions blocked.
    """
    L = mask.shape[-1]
    causal = jnp.triu(jnp.full((L, L), NEG_INF, dtype=jnp.float32), k=1)
    pad = (1.0 - mask.astype(jnp.float32))[:, None, None, :] * NEG_INF
    return (causal[None, None] + pad).astype(dtype)


class RobertaEmbeddings(nn.Module):
    vocab_size: int
    hidden_size: int
    max_position_embeddings: int
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5
    drop_rate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array, *, deterministic: bool = True,
                 position_ids: Optional[jax.Array] = None) -> jax.Array:
        if position_ids is None:
            position_ids = create_position_ids(input_ids, self.pad_token_id)
        we = nn.Embed(self.vocab_size, self.hidden_size, dtype=self.dtype,
                      embedding_init=bert_normal_init,
                      name="word_embeddings")(input_ids)
        pe = nn.Embed(self.max_position_embeddings, self.hidden_size,
                      dtype=self.dtype, embedding_init=bert_normal_init,
                      name="position_embeddings")(position_ids)
        te = nn.Embed(self.type_vocab_size, self.hidden_size,
                      dtype=self.dtype, embedding_init=bert_normal_init,
                      name="token_type_embeddings")(
            jnp.zeros_like(input_ids))
        x = we + te + pe
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                         name="LayerNorm")(x)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        return x


class MultiHeadAttention(nn.Module):
    """BERT-style attention: Q from x, K/V from x or an encoder memory.

    Emits context through an output dense + dropout (no residual/norm here —
    the layer applies them, matching the reference's modified SelfOutput).

    Also exposes the KV-cached decode interface (project_kv / attend /
    decode_step) used by the cached caption decoder — the reference decoder
    re-encodes the full prefix each token (objectives.py:560-644, no
    past_key_values plumbed); here incremental decode is the fast path and
    the re-encode stays as the parity oracle.
    """

    hidden_size: int
    num_heads: int
    kv_in_dim: Optional[int] = None  # None -> self-attention over x
    attn_drop: float = 0.1
    hidden_drop: float = 0.1
    # optional half-range clamp on scaled scores, applied BEFORE the
    # additive mask (GLIP BertSelfAttention clamp_min/max_for_overflow,
    # ref fine_grained/.../rpn/modeling_bert.py:139-146: +-50000)
    score_clamp: Optional[float] = None
    dtype: Dtype = jnp.float32

    def setup(self):
        self.query = nn.Dense(self.hidden_size, dtype=self.dtype,
                              kernel_init=bert_normal_init)
        self.key = nn.Dense(self.hidden_size, dtype=self.dtype,
                            kernel_init=bert_normal_init)
        self.value = nn.Dense(self.hidden_size, dtype=self.dtype,
                              kernel_init=bert_normal_init)
        self.out_dense = nn.Dense(self.hidden_size, dtype=self.dtype,
                                  kernel_init=bert_normal_init)
        self.attn_dropout = nn.Dropout(self.attn_drop)
        self.out_dropout = nn.Dropout(self.hidden_drop)

    def _split(self, x: jax.Array) -> jax.Array:
        B, L = x.shape[0], x.shape[1]
        h = self.num_heads
        return x.reshape(B, L, h, self.hidden_size // h).transpose(
            0, 2, 1, 3)

    def project_kv(self, src: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Head-shaped (B, h, L, hd) key/value projections of a memory —
        computed once per decode for the constant image K/V."""
        return self._split(self.key(src)), self._split(self.value(src))

    def attend(self, x: jax.Array, k: jax.Array, v: jax.Array,
               attn_mask: Optional[jax.Array] = None, *,
               deterministic: bool = True) -> jax.Array:
        """Q from x over precomputed head-shaped K/V."""
        h = self.num_heads
        hd = self.hidden_size // h
        q = self._split(self.query(x))
        B, Lq = x.shape[0], x.shape[1]
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(hd))
        if self.score_clamp is not None:
            scores = jnp.clip(scores, -self.score_clamp, self.score_clamp)
        if attn_mask is not None:
            scores = scores + attn_mask.astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        probs = self.attn_dropout(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, Lq, self.hidden_size)
        out = self.out_dense(ctx)
        return self.out_dropout(out, deterministic=deterministic)

    def decode_step(self, x_t: jax.Array, kv_cache, cache_index,
                    ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
        """One cached self-attention step: x_t (B, 1, D), kv_cache a
        (k, v) pair of (B, h, L_max, hd) buffers, cache_index the write
        position.  Returns (out (B, 1, D), updated cache)."""
        k_cache, v_cache = kv_cache
        k_t = self._split(self.key(x_t))    # (B, h, 1, hd)
        v_t = self._split(self.value(x_t))
        k_cache = jax.lax.dynamic_update_slice_in_dim(
            k_cache, k_t.astype(k_cache.dtype), cache_index, axis=2)
        v_cache = jax.lax.dynamic_update_slice_in_dim(
            v_cache, v_t.astype(v_cache.dtype), cache_index, axis=2)
        # only positions <= cache_index are live keys
        live = jnp.arange(k_cache.shape[2]) <= cache_index
        mask = jnp.where(live, 0.0, NEG_INF)[None, None, None, :]
        out = self.attend(x_t, k_cache, v_cache, attn_mask=mask,
                          deterministic=True)
        return out, (k_cache, v_cache)

    def __call__(self, x: jax.Array, attn_mask: Optional[jax.Array] = None,
                 memory: Optional[jax.Array] = None, *,
                 deterministic: bool = True) -> jax.Array:
        kv_src = x if memory is None else memory
        k = self._split(self.key(kv_src))
        v = self._split(self.value(kv_src))
        return self.attend(x, k, v, attn_mask=attn_mask,
                           deterministic=deterministic)


class RobertaLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    fuse_t2i: bool = False
    image_kv_dim: Optional[int] = None  # informational; K/V dense infers dim
    attn_drop: float = 0.1
    hidden_drop: float = 0.1
    layer_norm_eps: float = 1e-5
    # self-attention score clamp (GLIP BertEncoderLayer option, ref
    # vldyhead.py:645-652 CLAMP_BERTATTN_{MIN,MAX})
    score_clamp: Optional[float] = None
    dtype: Dtype = jnp.float32

    def setup(self):
        self.attention = MultiHeadAttention(
            hidden_size=self.hidden_size, num_heads=self.num_heads,
            attn_drop=self.attn_drop, hidden_drop=self.hidden_drop,
            score_clamp=self.score_clamp, dtype=self.dtype)
        self.attn_layer_norm = nn.LayerNorm(epsilon=self.layer_norm_eps,
                                            dtype=self.dtype)
        if self.fuse_t2i:
            self.crossattention_t2i = MultiHeadAttention(
                hidden_size=self.hidden_size, num_heads=self.num_heads,
                kv_in_dim=self.image_kv_dim, attn_drop=self.attn_drop,
                hidden_drop=self.hidden_drop, dtype=self.dtype)
            self.alpha_t2i = self.param("alpha_t2i", nn.initializers.zeros,
                                        (1,), jnp.float32)
        self.intermediate_dense = nn.Dense(
            self.intermediate_size, dtype=self.dtype,
            kernel_init=bert_normal_init)
        self.output_dense = nn.Dense(self.hidden_size, dtype=self.dtype,
                                     kernel_init=bert_normal_init)
        self.output_layer_norm = nn.LayerNorm(epsilon=self.layer_norm_eps,
                                              dtype=self.dtype)
        self.output_dropout = nn.Dropout(self.hidden_drop)

    def __call__(self, x: jax.Array, attn_mask: Optional[jax.Array] = None,
                 image_feats: Optional[jax.Array] = None, *,
                 last_norm: bool = True,
                 deterministic: bool = True) -> jax.Array:
        a = self.attention(x, attn_mask=attn_mask,
                           deterministic=deterministic)
        if image_feats is not None:
            assert self.fuse_t2i, "layer was not built with t2i fusion"
            # Image K/V are unmasked (all image tokens valid); the reference
            # passes encoder_attention_mask=None (fiber_module.py:331-343).
            c = self.crossattention_t2i(a, attn_mask=None,
                                        memory=image_feats,
                                        deterministic=deterministic)
            a = self.alpha_t2i.astype(self.dtype) * c + a
        a = self.attn_layer_norm(a + x)

        i = nn.gelu(self.intermediate_dense(a), approximate=False)
        o = self.output_dropout(self.output_dense(i),
                                deterministic=deterministic)
        o = o + a
        if last_norm:
            o = self.output_layer_norm(o)
        return o

    def decode_step(self, x_t: jax.Array, self_cache, cache_index,
                    image_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
                    ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
        """One KV-cached decoder step: x_t (B, 1, D) is the new token's
        hidden state, self_cache the layer's (k, v) buffers, image_kv the
        precomputed (constant per decode) cross-attention K/V."""
        a, new_cache = self.attention.decode_step(x_t, self_cache,
                                                  cache_index)
        if image_kv is not None:
            c = self.crossattention_t2i.attend(a, *image_kv,
                                               deterministic=True)
            a = self.alpha_t2i.astype(self.dtype) * c + a
        a = self.attn_layer_norm(a + x_t)
        i = nn.gelu(self.intermediate_dense(a), approximate=False)
        o = self.output_dense(i) + a
        return self.output_layer_norm(o), new_cache


class RobertaEncoderModel(nn.Module):
    """Embeddings + stack of layers, with stepwise access for the fusion
    interleave (the FIBER module drives individual layers)."""

    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    intermediate_size: int
    max_position_embeddings: int
    num_fuse_block: int = 6
    pad_token_id: int = 1
    type_vocab_size: int = 1
    attn_drop: float = 0.1
    hidden_drop: float = 0.1
    layer_norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32

    def setup(self):
        self.embeddings = RobertaEmbeddings(
            vocab_size=self.vocab_size, hidden_size=self.hidden_size,
            max_position_embeddings=self.max_position_embeddings,
            type_vocab_size=self.type_vocab_size,
            pad_token_id=self.pad_token_id, drop_rate=self.hidden_drop,
            layer_norm_eps=self.layer_norm_eps, dtype=self.dtype)
        n_pre = self.num_layers - self.num_fuse_block
        self.layers = [
            RobertaLayer(
                hidden_size=self.hidden_size, num_heads=self.num_heads,
                intermediate_size=self.intermediate_size,
                fuse_t2i=(i >= n_pre),
                attn_drop=self.attn_drop, hidden_drop=self.hidden_drop,
                layer_norm_eps=self.layer_norm_eps, dtype=self.dtype,
                name=f"layer_{i}")
            for i in range(self.num_layers)
        ]

    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        """Text-only full forward (used by the ITC text tower)."""
        x = self.embeddings(input_ids, deterministic=deterministic)
        mask = extended_attention_mask(attention_mask, self.dtype)
        for layer in self.layers:
            x = layer(x, attn_mask=mask, deterministic=deterministic)
        return x

    def init_full(self, input_ids: jax.Array, attention_mask: jax.Array,
                  image_feats_small: jax.Array, image_feats_large: jax.Array,
                  stage_switch: Optional[int] = None) -> jax.Array:
        """Init-only forward feeding image K/V into fused layers so their
        cross-attention params materialize (flax lazy init).

        Layers with index < stage_switch (default 10, matching the
        reference's stage-3/stage-4 K/V dim split, ref roberta.py:232-241)
        receive `image_feats_small`; the rest `image_feats_large`.
        """
        switch = 10 if stage_switch is None else stage_switch
        x = self.embeddings(input_ids)
        mask = extended_attention_mask(attention_mask, self.dtype)
        n_pre = self.num_layers - self.num_fuse_block
        for i, layer in enumerate(self.layers):
            feats = None
            if i >= n_pre:
                feats = image_feats_small if i < switch else image_feats_large
            x = layer(x, attn_mask=mask, image_feats=feats)
        return x
