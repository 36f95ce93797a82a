"""Image-text retrieval evaluation: ITC ranking + ITM reranking.

Behavioral spec: objectives.py:265-499 (compute_itc_recall /
compute_itm_recall).  The reference distributes images over DDP ranks with
pickled gloo gathers and reranks with per-pair forwards at batch 10; here
scoring is batched jit compute over device-sharded arrays, and the ITM
rerank runs the fused encoder on (image, text) pairs packed into large
batches — the headline throughput path (BASELINE.json north star).

The rerank depth is configurable: `rerank_topk=None` reranks every text
per image like the reference (O(Ni*Nt) fused forwards); the usual
practical setting reranks the ITC top-k only.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fiber_tpu.models.fiber import FiberCoarse


import functools


@functools.partial(jax.jit, static_argnames="model")
def _img_fn(model, v, x):
    return model.apply(v, x, method=FiberCoarse.encode_image_itc
                       )["cls_feats"]


@functools.partial(jax.jit, static_argnames="model")
def _txt_fn(model, v, ids, msk):
    return model.apply(v, ids, msk,
                       method=FiberCoarse.encode_text_itc)["cls_feats"]


def _rank_raw(model, v, img, ids, msk):
    out = model.apply(v, img, ids, msk, method=FiberCoarse.infer)
    return model.apply(v, out["cls_feats"],
                       method=FiberCoarse.rank_scores)[:, 0]


_rank_fn = jax.jit(_rank_raw, static_argnames="model")


@functools.partial(jax.jit, static_argnames=("model", "pair_batch"))
def _rank_pairs_scan(model, variables, images, text_ids, text_masks,
                     pair_img, pair_txt, pair_batch: int):
    """Score (pair_img, pair_txt) candidate pairs in ONE dispatch.

    The whole corpus is staged on device once; a lax.scan gathers each
    chunk's images/texts in HBM and runs the fused forward + rank head —
    no per-chunk host round-trips (the round-1 rerank loop staged every
    chunk through numpy, leaving the chip idle between dispatches).
    pair_img/pair_txt: (n_chunks * pair_batch,) padded index arrays.
    """
    n = pair_img.shape[0]
    bi = pair_img.reshape(n // pair_batch, pair_batch)
    bt = pair_txt.reshape(n // pair_batch, pair_batch)

    def chunk(_, idx):
        ci, ct = idx
        s = _rank_raw(model, variables, images[ci], text_ids[ct],
                      text_masks[ct])
        return None, s

    _, scores = jax.lax.scan(chunk, None, (bi, bt))
    return scores.reshape(-1)


@functools.partial(jax.jit, static_argnames=("model", "batch"))
def _encode_trunks_scan(model, variables, images, batch: int):
    """Image trunks for the whole corpus in ONE dispatch:
    (N, S, S, 3) -> (N, H3, W3, C3) via a lax.scan over batches."""
    N = images.shape[0]
    imgs = images.reshape(N // batch, batch, *images.shape[1:])

    def chunk(_, im):
        t = model.apply(variables, im,
                        method=FiberCoarse.encode_image_trunk)
        return None, t

    _, trunks = jax.lax.scan(chunk, None, imgs)
    return trunks.reshape(N, *trunks.shape[2:])


@functools.partial(jax.jit, static_argnames="model")
def _encode_text_pre(model, variables, text_ids, text_masks):
    return model.apply(variables, text_ids, text_masks,
                       method=FiberCoarse.encode_text_pre)


def _rank_tail_raw(model, v, trunk, text_pre, msk):
    out = model.apply(v, trunk, text_pre, msk,
                      method=FiberCoarse.infer_fused_tail)
    return model.apply(v, out["cls_feats"],
                       method=FiberCoarse.rank_scores)[:, 0]


@functools.partial(jax.jit, static_argnames=("model", "pair_batch"))
def _rank_pairs_cached(model, variables, trunks, text_pre, text_masks,
                       pair_img, pair_txt, pair_batch: int):
    """Score candidate pairs from cached per-image trunks and per-text
    prefixes: only the fused tail (last stage-3 blocks + stage 4 + heads,
    ~15% of the per-pair FLOPs) runs per pair.  Numerically identical to
    _rank_pairs_scan (infer == trunk + prefix + tail by construction);
    the reference rerank recomputes the full forward per pair
    (objectives.py:388-499)."""
    n = pair_img.shape[0]
    bi = pair_img.reshape(n // pair_batch, pair_batch)
    bt = pair_txt.reshape(n // pair_batch, pair_batch)

    def chunk(_, idx):
        ci, ct = idx
        s = _rank_tail_raw(model, variables, trunks[ci], text_pre[ct],
                           text_masks[ct])
        return None, s

    _, scores = jax.lax.scan(chunk, None, (bi, bt))
    return scores.reshape(-1)


def rank_pairs_pipeline(model, variables, images, text_ids, text_masks,
                        pair_img, pair_txt, pair_batch: int,
                        trunk_batch: int = 8):
    """End-to-end cached rerank: encode trunks + text prefixes, then
    score all pairs from the caches.  Returns (n_pairs,) scores."""
    trunks = _encode_trunks_scan(model, variables, images, trunk_batch)
    text_pre = _encode_text_pre(model, variables, text_ids, text_masks)
    return _rank_pairs_cached(model, variables, trunks, text_pre,
                              text_masks, jnp.asarray(pair_img),
                              jnp.asarray(pair_txt), pair_batch)


@functools.partial(jax.jit, static_argnames=("model", "batch"))
def _encode_corpus_scan(model, variables, images, text_ids, text_masks,
                        batch: int):
    """Both ITC towers over the whole (padded) corpus in ONE dispatch:
    lax.scan over image batches, then the text tower in one shot."""
    N = images.shape[0]
    imgs = images.reshape(N // batch, batch, *images.shape[1:])

    def chunk(_, im):
        return None, _img_fn(model, variables, im)

    _, img_emb = jax.lax.scan(chunk, None, imgs)
    txt_emb = _txt_fn(model, variables, text_ids, text_masks)
    return img_emb.reshape(N, -1), txt_emb


def encode_corpus(model: FiberCoarse, variables,
                  images: np.ndarray, text_ids: np.ndarray,
                  text_masks: np.ndarray,
                  batch_size: int = 64) -> Tuple[np.ndarray, np.ndarray]:
    """Unfused tower embeddings for all images / texts (normalized).

    The corpus is padded to a batch multiple and encoded inside one jit
    dispatch (the round-1 loop staged every chunk through numpy, leaving
    the chip idle between dispatches)."""
    Ni = images.shape[0]
    batch = min(batch_size, Ni)
    pad = (-Ni) % batch
    imgs = jnp.asarray(np.concatenate(
        [images, np.zeros((pad, *images.shape[1:]), images.dtype)])
        if pad else images, model.cfg.compute_dtype)
    img_emb, txt_emb = _encode_corpus_scan(
        model, variables, imgs, jnp.asarray(text_ids, jnp.int32),
        jnp.asarray(text_masks, jnp.int32), batch)
    return np.asarray(img_emb)[:Ni], np.asarray(txt_emb)


def itc_score_matrix(img_emb: np.ndarray, txt_emb: np.ndarray
                     ) -> np.ndarray:
    """(Ni, Nt) cosine scores (embeddings already normalized)."""
    return img_emb @ txt_emb.T


def itm_rerank_matrix(model: FiberCoarse, variables,
                      images: np.ndarray, text_ids: np.ndarray,
                      text_masks: np.ndarray, itc_i2t: np.ndarray,
                      rerank_topk: Optional[int] = 32,
                      pair_batch: int = 64,
                      on_device: bool = True) -> np.ndarray:
    """Rerank: fused forward + rank head on (image, text) candidate pairs
    (ref objectives.py:388-499 runs every pair; rerank_topk bounds it).

    With on_device=True (default) the cached pipeline runs: per-image
    trunks + per-text prefixes are encoded once (two dispatches) and all
    candidate pairs are scored from the caches in a third
    (rank_pairs_pipeline).  HBM note: the trunk cache holds all Ni
    stage-3 activation maps (Ni x H/16 x W/16 x 4C bf16 — ~0.6 MB per
    384^2 image); set on_device=False for the chunked host loop when the
    corpus exceeds device memory.

    Returns (Ni, Nt) matrix of rank scores at the evaluated pairs and
    -inf elsewhere.
    """
    Ni, Nt = itc_i2t.shape
    k = Nt if rerank_topk is None else min(rerank_topk, Nt)
    top_txt = np.argsort(-itc_i2t, axis=1)[:, :k]        # (Ni, k)

    pair_img = np.repeat(np.arange(Ni), k)
    pair_txt = top_txt.reshape(-1)
    n_pairs = len(pair_img)
    scores = np.full((Ni, Nt), -np.inf, np.float32)

    if on_device:
        pad = (-n_pairs) % pair_batch
        pi = np.concatenate([pair_img, np.zeros(pad, np.int64)])
        pt = np.concatenate([pair_txt, np.zeros(pad, np.int64)])
        trunk_batch = min(8, Ni)
        while Ni % trunk_batch:
            trunk_batch -= 1
        s = rank_pairs_pipeline(model, variables,
                                jnp.asarray(images, model.cfg.compute_dtype),
                                jnp.asarray(text_ids, jnp.int32),
                                jnp.asarray(text_masks, jnp.int32),
                                pi, pt, pair_batch,
                                trunk_batch=trunk_batch)
        scores[pair_img, pair_txt] = np.asarray(s)[:n_pairs]
        return scores

    rank_fn = functools.partial(_rank_fn, model)
    for i in range(0, n_pairs, pair_batch):
        bi = pair_img[i:i + pair_batch]
        bt = pair_txt[i:i + pair_batch]
        img = jnp.asarray(images[bi])
        ids = jnp.asarray(text_ids[bt])
        msk = jnp.asarray(text_masks[bt])
        pad = pair_batch - len(bi)
        if pad:
            img = jnp.pad(img, ((0, pad), (0, 0), (0, 0), (0, 0)))
            ids = jnp.pad(ids, ((0, pad), (0, 0)))
            msk = jnp.pad(msk, ((0, pad), (0, 0)))
        s = np.asarray(rank_fn(variables, img, ids, msk))[:len(bi)]
        scores[bi, bt] = s
    return scores


def recall_at_k(score_i2t: np.ndarray, img2txt: Sequence[Sequence[int]],
                txt2img: Sequence[int],
                ks: Sequence[int] = (1, 5, 10)) -> Dict[str, float]:
    """TR@k: rank texts per image (any GT caption hits top-k);
    IR@k: rank images per text (ref objectives.py:361-385)."""
    Ni, Nt = score_i2t.shape
    out = {}
    order_t = np.argsort(-score_i2t, axis=1)
    for k in ks:
        hit = 0
        for i in range(Ni):
            topk = set(order_t[i, :k].tolist())
            if topk & set(img2txt[i]):
                hit += 1
        out[f"tr_r{k}"] = hit / Ni
    order_i = np.argsort(-score_i2t.T, axis=1)
    for k in ks:
        hit = 0
        for t in range(Nt):
            if txt2img[t] in order_i[t, :k]:
                hit += 1
        out[f"ir_r{k}"] = hit / Nt
    return out


def evaluate_retrieval(model: FiberCoarse, variables, images, text_ids,
                       text_masks, img2txt, txt2img,
                       rerank_topk: Optional[int] = 32,
                       batch_size: int = 64) -> Dict[str, float]:
    """Full pipeline: ITC recall + ITM-reranked recall
    (ref epoch_wrapup recall suite, fiber_utils.py:44-140)."""
    img_emb, txt_emb = encode_corpus(model, variables, images, text_ids,
                                     text_masks, batch_size)
    itc = itc_score_matrix(img_emb, txt_emb)
    metrics = {f"itc_{k}": v
               for k, v in recall_at_k(itc, img2txt, txt2img).items()}
    rerank = itm_rerank_matrix(model, variables, images, text_ids,
                               text_masks, itc, rerank_topk, batch_size)
    # fall back to ITC ordering outside the reranked set
    combined = np.where(np.isinf(rerank), itc - 1e4, rerank)
    metrics.update({f"itm_{k}": v for k, v in
                    recall_at_k(combined, img2txt, txt2img).items()})
    return metrics
