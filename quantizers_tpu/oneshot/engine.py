"""Layer-sequential oneshot driver.

The TPU analog of llmcompressor's sequential pipeline (reference boundary at
``scripts/do_oneshot.py:177-187``): calibration batches are embedded once,
then each decoder layer is (1) run with capture to feed the modifiers'
observers, (2) compressed, (3) re-run with quantized weights so downstream
layers calibrate against the *quantized* upstream — exactly the
error-propagation property GPTQ/AWQ rely on. Pipelines:

* ``sequential`` — one pass; all modifiers applied per layer in recipe order.
* ``independent`` — each modifier gets its own full sequential pass
  (reference ``quantization_multiple_modifiers.py:102-109`` ``--independent``).
* ``basic`` — no error propagation: capture on the original model only.

Memory model: two modes via ``offload``.

* ``"device"`` (default, small/medium models): the whole params pytree and
  one (S, T, D) hidden block per calibration batch stay in HBM.
* ``"host"``: the TPU analog of the reference's accelerate CPU-offload
  maps (``main_devstral-gptq.py:57-113``) — params and hiddens live in
  host RAM; each layer is ``jax.device_put`` for its capture/compress/
  propagate window and fetched back quantized, and hiddens move through
  HBM one batch at a time. Peak HBM is ONE layer's weights + ONE batch of
  hiddens (plus transient embed-table residency during embedding);
  :func:`streaming_peak_bytes` computes the bound for a given spec so
  30B-class calibration can be planned against a single chip's HBM.

Modifier statistics (Hessians, channel means) are the modifiers' concern
(they already accumulate host-side numpy).
"""

from __future__ import annotations

import dataclasses
import logging
import os as _os
import time
from functools import partial
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.scheme import QuantizationArgs, QuantScheme
from ..formats.checkpoint import CompressedParam
from ..models.config import ModelSpec
from ..models.transformer import apply_layer, embed
from ..recipes import ModifierSpec, Recipe
from .modifiers import LayerCtx, Modifier, RTNModifier, SiteResult
from .sites import LinearSite, layer_sites, scheme_for_site

logger = logging.getLogger(__name__)


def _build_modifier(spec: ModifierSpec) -> Modifier:
    from .awq import AWQModifier
    from .gptq import GPTQModifier
    from .autoround import AutoRoundModifier
    from .smoothquant import SmoothQuantModifier

    table = {
        "QuantizationModifier": RTNModifier,
        "AWQModifier": AWQModifier,
        "GPTQModifier": GPTQModifier,
        "AutoRoundModifier": AutoRoundModifier,
        "SmoothQuantModifier": SmoothQuantModifier,
    }
    cls = table.get(spec.name)
    if cls is None:
        raise ValueError(f"Unsupported modifier {spec.name!r}; known: {sorted(table)}")
    return cls(spec)


@dataclasses.dataclass
class OneshotResult:
    params: Dict[str, Any]
    records: Dict[str, CompressedParam]
    extra_tensors: Dict[str, np.ndarray]
    config_groups: Dict[str, QuantScheme]
    ignore: List[str]
    kv_cache_scheme: Optional[QuantizationArgs]
    stats: Dict[str, float]


def make_batches(tokenized: Iterable[Any], max_seq_length: int,
                 batch_size: int = 4, pad_to_multiple: int = 128,
                 pad_id: int = 0) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Pack tokenized samples (dicts with ``input_ids`` or raw id lists)
    into fixed-shape (ids, mask) batches. Sequences are right-padded to the
    batch max rounded up to ``pad_to_multiple`` (static shapes for XLA;
    bucketing keeps recompiles to a handful)."""
    rows: List[List[int]] = []
    for s in tokenized:
        ids = s["input_ids"] if isinstance(s, dict) else s
        ids = list(ids)[:max_seq_length]
        if ids:
            rows.append(ids)
    rows.sort(key=len)  # length-bucketing minimizes padding waste
    pad_to_multiple = min(pad_to_multiple, max_seq_length)
    batches: List[Tuple[np.ndarray, np.ndarray]] = []
    for i in range(0, len(rows), batch_size):
        chunk = rows[i : i + batch_size]
        longest = max(len(r) for r in chunk)
        T = min(max_seq_length,
                -(-longest // pad_to_multiple) * pad_to_multiple)
        T = max(T, pad_to_multiple)
        ids = np.full((len(chunk), T), pad_id, dtype=np.int32)
        mask = np.zeros((len(chunk), T), dtype=np.float32)
        for j, r in enumerate(chunk):
            r = r[:T]
            ids[j, : len(r)] = r
            mask[j, : len(r)] = 1.0
        batches.append((ids, mask))
    return batches


def _capture_layer(layer, spec, idx, hiddens, positions, moe_all_experts):
    """jit-able: one layer forward with capture; returns (out, capture)."""
    cap: Dict[str, jnp.ndarray] = {}
    out, _ = apply_layer(layer, spec, idx, hiddens, positions, None,
                         moe_all_experts, cap)
    return out, cap


# Layer forwards are compiled ONCE per (spec, layer-kind, shapes) — not once
# per layer. ``apply_layer`` consumes ``layer_idx`` only through
# ``spec.layer_is_moe`` (a Python-level branch), so every layer of the same
# kind shares one executable when called with its kind's *canonical* index.
# A 36-layer Qwen3 run compiles 2 programs (capture + propagate) instead of
# 72 — compile time dominated early-round calibration wall-clock.
@partial(jax.jit, static_argnames=("spec", "canon_idx", "moe_all"))
def _capture_jit(layer, spec, canon_idx, h, pos, moe_all):
    return _capture_layer(layer, spec, canon_idx, h, pos, moe_all)


@partial(jax.jit, static_argnames=("spec", "canon_idx", "moe_all"))
def _propagate_jit(layer, spec, canon_idx, h, pos, moe_all):
    return apply_layer(layer, spec, canon_idx, h, pos, None, moe_all)[0]


def _capture_alias_map(layer, spec, canon_idx, h, pos, moe_all) -> Dict[str, str]:
    """capture_key → canonical capture_key for keys that are the SAME traced
    tensor inside the layer forward (q/k/v share the post-norm hidden,
    gate/up likewise, MoE gate/up/router/shared all see the pre-routing h2).

    Identity must be read off the jaxpr output vars: a jit'd dict output
    yields a DISTINCT Python array per key even when two keys were one
    tensor, so ``id()`` on runtime outputs cannot detect sharing. Modifiers
    use this map to accumulate one Hessian per distinct input instead of
    one per site. One host-side trace per layer kind; no device work."""
    closed, shapes = jax.make_jaxpr(
        lambda lyr, hh, pp: _capture_layer(lyr, spec, canon_idx, hh, pp, moe_all),
        return_shape=True)(layer, h, pos)
    paths = [p for p, _ in jax.tree_util.tree_flatten_with_path(shapes)[0]]
    outvars = closed.jaxpr.outvars
    first_for_var: Dict[int, str] = {}
    alias: Dict[str, str] = {}
    for path, var in zip(paths, outvars):
        # cap-dict entries have path (SequenceKey(1), DictKey(<capture_key>))
        if (len(path) == 2
                and isinstance(path[0], jax.tree_util.SequenceKey)
                and path[0].idx == 1
                and isinstance(path[1], jax.tree_util.DictKey)):
            key = str(path[1].key)
            canon = first_for_var.setdefault(id(var), key)
            if canon != key:
                alias[key] = canon
    return alias


def _canonical_layer_idx(spec: ModelSpec, layer_idx: int) -> int:
    """First layer index with the same ``spec.layer_kind`` as
    ``layer_idx`` — the jit cache key stand-in. ``layer_kind`` is the
    declared contract that same-kind layers trace to identical programs
    (ModelSpec.layer_kind documents the obligation on future per-index
    behavior; a jaxpr-equality test enforces it)."""
    kind = spec.layer_kind(layer_idx)
    for i in range(layer_idx + 1):
        if spec.layer_kind(i) == kind:
            return i
    return layer_idx


def _tree_to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _tree_to_device(tree):
    return jax.tree_util.tree_map(jnp.asarray, tree)


def streaming_peak_bytes(spec: ModelSpec, batch_size: int, seq_len: int,
                         hidden_dtype_bytes: int = 2) -> Dict[str, int]:
    """Device-memory bound of the ``offload='host'`` pipeline: the maximum
    of (embed table + one batch of hiddens) during embedding and (one
    layer's bf16-equivalent weights + one batch of hiddens) during the
    per-layer loop. Pure shape math — use it to plan 30B-class calibration
    against one chip's HBM without allocating anything."""
    D, Ff = spec.hidden_size, spec.intermediate_size
    attn = 2 * D * (spec.q_dim + 2 * spec.kv_dim) + 2 * spec.q_dim * D
    if spec.num_experts:
        ff_e = getattr(spec, "moe_intermediate_size", None) or Ff
        mlp = spec.num_experts * 2 * (2 * D * ff_e + ff_e * D)
    else:
        mlp = 2 * (2 * D * Ff + Ff * D)
    layer_bytes = attn + mlp + 4 * D  # + norms
    hidden_bytes = batch_size * seq_len * D * hidden_dtype_bytes
    embed_bytes = spec.vocab_size * D * 2
    return {
        "layer_bytes": layer_bytes,
        "hidden_bytes": hidden_bytes,
        "embed_bytes": embed_bytes,
        "peak_bytes": max(embed_bytes, layer_bytes) + hidden_bytes,
    }


def oneshot(
    spec: ModelSpec,
    params: Dict[str, Any],
    recipe: Recipe,
    batches: Sequence[Tuple[np.ndarray, np.ndarray]],
    moe_calibrate_all_experts: bool = True,
    pipeline: Optional[str] = None,
    offload: str = "device",
) -> OneshotResult:
    """Run calibrated quantization over ``params`` (modified in place and
    returned inside the result). ``offload='host'`` streams one layer and
    one hidden batch through HBM at a time (module docstring)."""
    if offload not in ("device", "host"):
        raise ValueError(f"offload must be 'device' or 'host', got {offload!r}")
    t0 = time.time()
    pipeline = pipeline or recipe.pipeline
    modifiers = [_build_modifier(m) for m in recipe.modifiers]

    if pipeline == "independent":
        # Each modifier gets its own full sequential pass; results are
        # MERGED — every pass's records/config_groups survive into the
        # final artifact (a mixed-precision recipe must keep the first
        # group's compression, not just the last's).
        merged_records: Dict[str, CompressedParam] = {}
        merged_extra: Dict[str, np.ndarray] = {}
        merged_groups: Dict[str, QuantScheme] = {}
        merged_ignore: List[str] = []
        merged_stats: Dict[str, float] = {}
        kv_scheme_out: Optional[QuantizationArgs] = None
        for i, (mspec, mod) in enumerate(zip(recipe.modifiers, modifiers)):
            sub = Recipe(modifiers=[mspec], pipeline="sequential", raw=recipe.raw)
            result = oneshot(spec, params, sub, batches,
                             moe_calibrate_all_experts, pipeline="sequential",
                             offload=offload)
            params = result.params
            merged_records.update(result.records)
            merged_extra.update(result.extra_tensors)
            for gname, scheme in result.config_groups.items():
                key = gname if gname not in merged_groups else f"{gname}_m{i}"
                merged_groups[key] = scheme
            for ig in result.ignore:
                if ig not in merged_ignore:
                    merged_ignore.append(ig)
            merged_stats[f"pass_{i}_s"] = result.stats.get("total_s", 0.0)
            if result.kv_cache_scheme is not None:
                kv_scheme_out = result.kv_cache_scheme
        merged_stats["total_s"] = time.time() - t0
        return OneshotResult(
            params=params, records=merged_records, extra_tensors=merged_extra,
            config_groups=merged_groups, ignore=merged_ignore,
            kv_cache_scheme=kv_scheme_out or recipe.kv_cache_scheme(),
            stats=merged_stats)

    propagate = pipeline != "basic"

    # ---- merged config groups across modifiers (for the saved config) ----
    config_groups: Dict[str, QuantScheme] = {}
    ignore: List[str] = []
    for i, mspec in enumerate(recipe.modifiers):
        for gname, scheme in mspec.config_groups.items():
            key = gname if gname not in config_groups else f"{gname}_m{i}"
            config_groups[key] = scheme
        for ig in mspec.ignore:
            if ig not in ignore:
                ignore.append(ig)

    host_mode = offload == "host"
    if host_mode:
        # params live host-side for the whole run; layers visit HBM one at
        # a time below. (No-op for leaves that are already numpy.)
        params = _tree_to_host(params)

    # ---- embed calibration data once -------------------------------------
    # host mode: the embed table visits HBM once, each batch's hiddens are
    # fetched straight back to host RAM, and the device table is dropped
    # before the layer loop starts.
    hiddens: List[Any] = []
    positions: List[Any] = []
    masks: List[Any] = []
    valid_rows: List[int] = []  # host-side valid-token counts per batch
    embed_dev = {"embed": jnp.asarray(params["embed"])} if (host_mode and batches) \
        else params
    for ids, mask in batches:
        ids_j = jnp.asarray(ids)
        h = embed(embed_dev, ids_j)
        hiddens.append(np.asarray(h) if host_mode else h)
        B, T = ids.shape
        pos = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
        positions.append(np.asarray(pos) if host_mode else pos)
        masks.append(np.asarray(mask) if host_mode else jnp.asarray(mask))
        valid_rows.append(int(np.asarray(mask).sum()) if mask is not None else B * T)
    del embed_dev

    records: Dict[str, CompressedParam] = {}
    extra_tensors: Dict[str, np.ndarray] = {}
    stage_s = {"capture_s": 0.0, "solve_s": 0.0, "propagate_s": 0.0}

    # FP8 KV-cache calibration (reference `main_seed-oss-fp8-kv8.py:168-202`):
    # track per-layer k/v absmax during the capture pass, emit k_scale/v_scale.
    kv_scheme = recipe.kv_cache_scheme()
    kv_absmax: Dict[int, Tuple[float, float]] = {
        i: (0.0, 0.0) for i in range(len(params["layers"]))}
    capture_aliases: Dict[int, Dict[str, str]] = {}  # canon layer idx → map

    for li, host_layer in enumerate(params["layers"]):
        t_layer = time.time()
        # host mode: this layer's weights enter HBM here and leave (as the
        # quantized layer) at the end of the iteration — the only other
        # device residents are one batch of hiddens at a time.
        layer = _tree_to_device(host_layer) if host_mode else host_layer
        sites = layer_sites(spec, li, layer)

        # which modifier owns which site (first match in recipe order wins);
        # transform-only modifiers (SmoothQuant) observe every site but
        # never claim ownership — their paired quantizer compresses.
        owned: List[Tuple[Modifier, LinearSite, str, QuantScheme]] = []
        observe_only: List[Tuple[Modifier, LinearSite, str, Optional[QuantScheme]]] = []
        taken: set = set()
        for mod in modifiers:
            if mod.transforms_only:
                observe_only.extend((mod, site, "", None) for site in sites)
                continue
            for site in sites:
                if site.prefix in taken:
                    continue
                hit = scheme_for_site(site, mod.spec.config_groups,
                                      mod.spec.ignore, spec.num_experts)
                if hit is not None:
                    gname, scheme = hit
                    owned.append((mod, site, gname, scheme))
                    taken.add(site.prefix)

        ctx = LayerCtx(spec=spec, layer_idx=li, layer=layer, sites=sites)
        per_mod: Dict[int, List[Tuple[LinearSite, str, QuantScheme]]] = {}
        for mod, site, gname, scheme in owned + observe_only:
            per_mod.setdefault(id(mod), []).append((site, gname, scheme))
        states: Dict[int, Any] = {}
        want_capture = kv_scheme is not None
        for mod in modifiers:
            matched = per_mod.get(id(mod), [])
            if not matched:
                continue
            states[id(mod)] = mod.begin_layer(ctx, matched)
            want_capture = want_capture or mod.wants_capture_for(matched)

        canon_idx = _canonical_layer_idx(spec, li)

        # ---- capture pass -------------------------------------------------
        if (owned or observe_only or kv_scheme is not None) and want_capture and batches:
            t_cap = time.time()
            sync_every = int(_os.environ.get("QTPU_CAPTURE_SYNC_EVERY", "4"))
            if canon_idx not in capture_aliases:
                capture_aliases[canon_idx] = _capture_alias_map(
                    layer, spec, canon_idx, hiddens[0], positions[0],
                    moe_calibrate_all_experts)
            for bi, (h, pos, mask) in enumerate(zip(hiddens, positions, masks)):
                _, cap = _capture_jit(layer, spec, canon_idx, h, pos,
                                      moe_calibrate_all_experts)
                # explicit batch ordinal for per-batch dedup in modifiers
                # that observe one shared input for several sites (id() of
                # the capture dict is NOT stable: values recycle after GC)
                cap["_batch_idx"] = bi
                # structural shared-input map + host-side valid-token count
                # (modifiers must not sync the device for either)
                cap["_aliases"] = capture_aliases[canon_idx]
                cap["_valid_rows"] = valid_rows[bi]
                for mod, site, gname, scheme in observe_only + owned:
                    x_in = cap.get(site.capture_key)
                    if x_in is not None:
                        mod.observe(states[id(mod)], site, x_in, mask, cap)
                if kv_scheme is not None:
                    kmax = float(jnp.max(jnp.abs(cap["k_cache"].astype(jnp.float32))))
                    vmax = float(jnp.max(jnp.abs(cap["v_cache"].astype(jnp.float32))))
                    kv_absmax[li] = (max(kv_absmax[li][0], kmax),
                                     max(kv_absmax[li][1], vmax))
                # bound the async pipeline: each in-flight batch pins its
                # full capture set (~0.4 GB at Qwen3-4B geometry) until its
                # observe reductions land — unbounded dispatch transiently
                # OOMs a 16 GB chip that comfortably fits the steady state.
                # The barrier reads one element of each modifier's observe
                # ACCUMULATOR: on PJRT, D2H transfers complete on data
                # dependency (not stream order), so only a readback whose
                # producing op depends on the observe work actually waits
                # for it (ADVICE r4 #2); block_until_ready is additionally
                # unreliable on the tunneled backend (acked early).
                if sync_every and (bi + 1) % sync_every == 0:
                    synced = False
                    for mod in modifiers:
                        st = states.get(id(mod))  # unmatched modifiers
                        if st is None:            # have no layer state
                            continue
                        for arr in mod.sync_arrays(st):
                            np.asarray(arr.ravel()[:1])
                            synced = True
                    if not synced:
                        # no device accumulators (e.g. pure RTN): a capture
                        # readback only bounds DISPATCH to ~sync_every
                        # batches — weaker, but those modifiers enqueue no
                        # observe work to wait for
                        for v in cap.values():
                            if isinstance(v, jax.Array):
                                np.asarray(v.ravel()[:1])
                                break
            stage_s["capture_s"] += time.time() - t_cap

        # ---- layer-level transforms (AWQ smoothing), then compress ---------
        t_solve = time.time()
        for mod in modifiers:
            matched = per_mod.get(id(mod), [])
            if matched:
                mod.pre_compress(states[id(mod)], ctx, matched)
        for mod, site, gname, scheme in owned:
            res: SiteResult = mod.compress(states[id(mod)], site, gname, scheme)
            site.set(res.new_linear)
            if host_mode:
                # offload mode: quantized records leave HBM immediately —
                # holding a 30B model's records on device would defeat the
                # one-layer-in-HBM streaming plan
                from .modifiers import _to_host

                records.update({key: dataclasses.replace(cp, qt=_to_host(cp.qt))
                                for key, cp in res.records.items()})
            else:
                # records stay DEVICE-resident (serialization downloads at
                # write time); a one-element readback of the new linear
                # still bounds the dispatch pipeline to ~one site's solve
                # graph — the bulk download this replaces cost ~100 MB/layer
                # at the tunnel's 16 MB/s, a third of the GPTQ wall
                records.update(res.records)
                np.asarray(res.new_linear.weight.ravel()[:1])
            extra_tensors.update(res.extra_tensors)
        stage_s["solve_s"] += time.time() - t_solve

        # ---- propagate ----------------------------------------------------
        if propagate and batches:
            t_prop = time.time()
            if host_mode:
                # one batch resident at a time; outputs return to host RAM
                hiddens = [np.asarray(_propagate_jit(
                               layer, spec, canon_idx, h, pos,
                               moe_calibrate_all_experts))
                           for h, pos in zip(hiddens, positions)]
            else:
                hiddens = [_propagate_jit(layer, spec, canon_idx, h, pos,
                                          moe_calibrate_all_experts)
                           for h, pos in zip(hiddens, positions)]
            stage_s["propagate_s"] += time.time() - t_prop

        if host_mode:
            # quantized layer leaves HBM; params keeps the host copy
            params["layers"][li] = _tree_to_host(layer)
            del layer

        if owned:
            dt_layer = time.time() - t_layer
            stage_s.setdefault("layer_s", []).append(round(dt_layer, 2))
            logger.info("layer %d: %d sites compressed in %.1fs", li, len(owned),
                        dt_layer)

    if kv_scheme is not None and batches:
        divisor = kv_scheme.scale_divisor
        for li, (kmax, vmax) in kv_absmax.items():
            p = f"model.layers.{li}.self_attn"
            extra_tensors[f"{p}.k_scale"] = np.asarray(
                [max(kmax / divisor, 1e-10)], np.float32)
            extra_tensors[f"{p}.v_scale"] = np.asarray(
                [max(vmax / divisor, 1e-10)], np.float32)

    # lm_head (rarely targeted; reference recipes ignore it)
    stats = {"total_s": time.time() - t0, **stage_s}
    return OneshotResult(
        params=params,
        records=records,
        extra_tensors=extra_tensors,
        config_groups=config_groups,
        ignore=ignore,
        kv_cache_scheme=recipe.kv_cache_scheme(),
        stats=stats,
    )
