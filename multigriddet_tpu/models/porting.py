"""Keras-HDF5 -> flax weight porting (layer-order based).

The capability counterpart of the reference's ``load_weights_with_debug``
(/root/reference/multigriddet/models/multigriddet_darknet.py:25-485): load
pretrained Keras weights — including the BN moving statistics the reference
has to patch in manually (229-276) — into the flax parameter tree, with a
loaded/missing/shape-mismatch audit report.

Mapping strategy: both frameworks create layers in the same order (stem ->
darknet stages -> per-scale head bottleneck -> predict -> FPN merge ...),
so the k-th conv kernel in the flax init-order traversal corresponds to the
k-th conv layer in the HDF5 file's ``layer_names`` order, and likewise for
BatchNorm quadruples.  Keras kernels are (kh, kw, cin, cout) — the same
layout flax uses — so no transposition is needed.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def _flatten_ordered(tree, prefix=()):
    """Flatten a nested dict preserving insertion (creation) order."""
    out = []
    for k, v in tree.items():
        if isinstance(v, dict):
            out.extend(_flatten_ordered(v, prefix + (k,)))
        else:
            out.append((prefix + (k,), v))
    return out


def module_call_order(model, input_hw):
    """True module execution order, traced from ``init``.

    JAX pytrees sort dict keys, so a params tree that has passed through
    jit loses creation order (``ConvBN_10`` sorts before ``ConvBN_2``, and
    interleaved sibling classes scramble entirely).  The
    capture-intermediates filter fires in execution order during tracing —
    exactly the layer-creation order Keras uses for its HDF5 files.

    Returns the ordered list of module paths (tuples) for Conv and
    BatchNorm leaves.
    """
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from .layers import _ConvKernel, _PhaseBN

    order = []
    seen = set()

    # _ConvKernel/_PhaseBN are the space-to-depth path's stand-ins for
    # nn.Conv/nn.BatchNorm on the SAME param paths (layers.py); without
    # them the s2d stem/downsample modules fall out of the traced order
    # and order-based matching pairs same-shaped convs wrongly.
    conv_bn_types = (nn.Conv, nn.BatchNorm, _ConvKernel, _PhaseBN)

    def record(mdl, method_name):
        if isinstance(mdl, conv_bn_types):
            path = tuple(mdl.path)
            if path not in seen:
                seen.add(path)
                order.append(path)
        return False  # capture nothing

    jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *input_hw, 3), jnp.float32),
        train=False, capture_intermediates=record))
    return order


def _collect_flax_units(params: Dict, batch_stats: Dict,
                        call_order=None):
    """Group flax leaves into ordered conv / bn units.

    Returns a list of ('conv', {...paths}) / ('bn', {...paths}) in creation
    order.  A conv unit holds 'kernel' (+ optional 'bias'); a bn unit holds
    'scale', 'bias', 'mean', 'var'.

    ``call_order`` (from :func:`module_call_order`) gives the true
    execution order; without it the dict insertion order is used, which is
    only correct for trees that never passed through a jax pytree (jit
    sorts dict keys).
    """
    stats_index = {}
    for path, leaf in _flatten_ordered(batch_stats):
        stats_index[path] = leaf

    units: List[Tuple[str, Dict]] = []
    by_module: Dict[Tuple, Dict] = {}
    order: List[Tuple] = []
    for path, leaf in _flatten_ordered(params):
        module, leaf_name = path[:-1], path[-1]
        if module not in by_module:
            by_module[module] = {}
            order.append(module)
        by_module[module][leaf_name] = path
    if call_order is not None:
        # flax module paths name the Conv/BatchNorm leaves directly
        ordered = [p for p in call_order if p in by_module]
        missing = [m for m in order if m not in set(ordered)]
        order = ordered + missing
    for module in order:
        leaves = by_module[module]
        if 'kernel' in leaves:
            units.append(('conv', {'kernel': leaves['kernel'],
                                   **({'bias': leaves['bias']}
                                      if 'bias' in leaves else {})}))
        elif 'scale' in leaves and 'bias' in leaves:
            mean = module + ('mean',)
            var = module + ('var',)
            units.append(('bn', {'scale': leaves['scale'],
                                 'bias': leaves['bias'],
                                 'mean': mean if mean in stats_index
                                 else None,
                                 'var': var if var in stats_index
                                 else None}))
    return units


def _name_key(name: str):
    """('conv2d', 5) from 'conv2d_5'; index 0 when no numeric suffix."""
    parts = name.rsplit('_', 1)
    if len(parts) == 2 and parts[1].isdigit():
        return parts[0], int(parts[1])
    return name, 0


def _collect_h5_units(h5file):
    """Ordered conv/bn weight arrays from a Keras weights HDF5 file.

    Supports both the legacy Keras-2 layout (``layer_names``/
    ``weight_names`` attrs, creation-ordered) and the Keras-3
    ``layers/<name>/vars/{0..n}`` layout.  h5py iterates groups
    alphabetically, so for Keras 3 the creation order is reconstructed from
    each layer name's numeric suffix (``conv2d``, ``conv2d_1``, ...).
    """
    import h5py

    units = []

    if 'layers' in h5file:  # Keras 3 .weights.h5
        layers_grp = h5file['layers']
        names = sorted(layers_grp.keys(), key=_name_key)
        for lname in names:
            grp = layers_grp[lname]
            if 'vars' not in grp:
                continue
            var_keys = sorted(grp['vars'].keys(), key=lambda k: int(k))
            arrays = [np.asarray(grp['vars'][k]) for k in var_keys]
            if not arrays:
                continue
            if arrays[0].ndim == 4:
                unit = {'kernel': arrays[0]}
                if len(arrays) > 1 and arrays[1].ndim == 1:
                    unit['bias'] = arrays[1]
                units.append(('conv', unit, lname))
            elif len(arrays) == 4 and all(a.ndim == 1 for a in arrays):
                units.append(('bn', {
                    'scale': arrays[0], 'bias': arrays[1],
                    'mean': arrays[2], 'var': arrays[3]}, lname))
        return units

    root = h5file['model_weights'] if 'model_weights' in h5file else h5file
    layer_names = [n.decode() if isinstance(n, bytes) else n
                   for n in root.attrs.get('layer_names', list(root.keys()))]
    for lname in layer_names:
        grp = root[lname]
        weight_names = [n.decode() if isinstance(n, bytes) else n
                        for n in grp.attrs.get('weight_names', [])]
        arrays = {wn.split('/')[-1].split(':')[0]: np.asarray(grp[wn])
                  for wn in weight_names}
        if not arrays:
            continue
        if 'kernel' in arrays or any(a.ndim == 4 for a in arrays.values()):
            kernel = arrays.get('kernel')
            if kernel is None:
                kernel = next(a for a in arrays.values() if a.ndim == 4)
            unit = {'kernel': kernel}
            if 'bias' in arrays:
                unit['bias'] = arrays['bias']
            units.append(('conv', unit, lname))
        elif 'gamma' in arrays or 'moving_mean' in arrays:
            units.append(('bn', {
                'scale': arrays.get('gamma'),
                'bias': arrays.get('beta'),
                'mean': arrays.get('moving_mean'),
                'var': arrays.get('moving_variance')}, lname))
    return units


def port_keras_weights(h5_path: str, variables: Dict[str, Any],
                       verbose: bool = True, model=None,
                       input_hw=None) -> Dict[str, Any]:
    """Load Keras h5 weights into flax ``{'params', 'batch_stats'}``.

    Conv and BN units are matched in creation order with shape checks;
    mismatches are reported and skipped (reference behavior: by-name ->
    by-position fallback with audit printing).

    Pass ``model`` (+ ``input_hw``) so the true module execution order can
    be traced — required whenever ``variables`` came through jit (jax
    pytrees sort dict keys, scrambling numeric module suffixes).

    Returns new variables (copies; the input is not mutated).
    """
    import copy
    import h5py

    params = copy.deepcopy(_to_mutable(variables['params']))
    batch_stats = copy.deepcopy(
        _to_mutable(variables.get('batch_stats', {})))

    call_order = None
    if model is not None:
        if input_hw is None:
            input_hw = (64, 64)
        call_order = module_call_order(model, input_hw)
    flax_units = _collect_flax_units(params, batch_stats, call_order)
    with h5py.File(h5_path, 'r') as f:
        h5_units = _collect_h5_units(f)

    # Matching strategy.  Keras files list layers in the MODEL's
    # topological order (both the legacy layer_names attr and the Keras-3
    # `layers/` group, whose conv2d_N names are regenerated at save time);
    # flax units come in execution (creation) order.  For DAGs with
    # branches (the predict heads) these orders differ, but only by
    # moving blocks of DISTINCT shapes around: units that share a shape
    # keep their relative order.  So convs are matched per shape class
    # (k-th h5 occurrence of a shape <-> k-th flax occurrence), biased
    # (predict) and bias-free streams separately, and the resulting
    # permutation is reused for the BN stream (every bias-free conv owns
    # exactly one BN in both frameworks).
    def split(units, biased):
        return [u for u in units
                if u[0] == 'conv' and (('bias' in u[1]) == biased)]

    flax_bns = [u for u in flax_units if u[0] == 'bn']
    h5_bns = [u for u in h5_units if u[0] == 'bn']

    loaded = mismatched = 0

    def set_path(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node[p]
        node[path[-1]] = np.asarray(value, np.float32)

    def match_stream(flax_convs, h5_convs):
        """Per-shape-class matching.  Returns (fi, hi, transpose) triples.

        Keras DepthwiseConv2D kernels are ``(kh, kw, C, 1)`` while flax
        depthwise convs (``feature_group_count=C``) store ``(kh, kw, 1,
        C)`` — the lite/separable models' depthwise weights live in the
        transposed shape class, so a flax ``(k, k, 1, C)`` unit with no
        same-shape pool falls back to the Keras-depthwise shape and is
        transposed on assignment."""
        from collections import defaultdict
        by_shape_h5 = defaultdict(list)
        for hi, (_, hu, _) in enumerate(h5_convs):
            by_shape_h5[tuple(hu['kernel'].shape)].append(hi)
        pairs = []
        taken = defaultdict(int)
        for fi, (_, fu) in enumerate(flax_convs):
            shape = tuple(_get_path(params, fu['kernel']).shape)
            candidates = [(shape, False)]
            if len(shape) == 4 and shape[2] == 1 and shape[3] > 1:
                candidates.append(
                    ((shape[0], shape[1], shape[3], 1), True))
            for cand, transpose in candidates:
                pool = by_shape_h5.get(cand, [])
                k = taken[cand]
                if k < len(pool):
                    pairs.append((fi, pool[k], transpose))
                    taken[cand] += 1
                    break
        return pairs

    def is_dw_flax(fu):
        s = tuple(_get_path(params, fu['kernel']).shape)
        return len(s) == 4 and s[2] == 1 and s[3] > 1

    def is_dw_h5(hu):
        s = hu['kernel'].shape
        return len(s) == 4 and s[3] == 1 and s[2] > 1

    def reorder_h5_by_class(h_stream, f_stream):
        """Reconstruct the h5 conv stream's CREATION order across layer
        classes.  Keras-3 name counters are per class (conv2d_*,
        depthwise_conv2d_*), so the sorted-name order groups all normal
        convs before all depthwise ones; within each class the order is
        creation order.  Interleaving the two class queues to the flax
        call-order class pattern restores 'the k-th BN belongs to the
        k-th bias-free conv', which the BN pairing below relies on."""
        dw = [u for u in h_stream if is_dw_h5(u[1])]
        if not dw:
            return h_stream
        queues = {True: iter(dw),
                  False: iter([u for u in h_stream if not is_dw_h5(u[1])])}
        out = []
        for _, fu in f_stream:
            nxt = next(queues[is_dw_flax(fu)], None)
            if nxt is not None:
                out.append(nxt)
        used = {id(u) for u in out}
        out.extend(u for u in h_stream if id(u) not in used)
        return out

    for biased in (False, True):
        f_stream = split(flax_units, biased)
        h_stream = split(h5_units, biased)
        if not biased:
            h_stream = reorder_h5_by_class(h_stream, f_stream)
        pairs = match_stream(f_stream, h_stream)
        mismatched += max(len(f_stream), len(h_stream)) - len(pairs)
        for fi, hi, transpose in pairs:
            fu = f_stream[fi][1]
            hu = h_stream[hi][1]
            kernel = hu['kernel']
            if transpose:  # Keras depthwise (k,k,C,1) -> flax (k,k,1,C)
                kernel = np.transpose(kernel, (0, 1, 3, 2))
            set_path(params, fu['kernel'], kernel)
            if 'bias' in fu and 'bias' in hu:
                set_path(params, fu['bias'], hu['bias'])
            loaded += 1
        if not biased and len(f_stream) == len(flax_bns) \
                and len(h_stream) == len(h5_bns):
            # BN-k belongs to conv-k in each stream: reuse the permutation
            for fi, hi, _ in pairs:
                fu = flax_bns[fi][1]
                hu = h5_bns[hi][1]
                target_shape = tuple(_get_path(params, fu['scale']).shape)
                if (hu['scale'] is None
                        or tuple(hu['scale'].shape) != target_shape):
                    mismatched += 1
                    continue
                set_path(params, fu['scale'], hu['scale'])
                set_path(params, fu['bias'], hu['bias'])
                # BN moving statistics (the part Keras by-name loading
                # breaks on; reference fixes it manually at
                # multigriddet_darknet.py:229-276)
                if fu['mean'] is not None and hu['mean'] is not None:
                    set_path(batch_stats, fu['mean'], hu['mean'])
                    set_path(batch_stats, fu['var'], hu['var'])
                loaded += 1

    if verbose:
        print(f'Ported {loaded} units from {h5_path} '
              f'({mismatched} shape mismatches; '
              f'flax: {sum(u[0] == "conv" for u in flax_units)} convs / '
              f'{len(flax_bns)} bns, '
              f'h5: {sum(u[0] == "conv" for u in h5_units)} convs / '
              f'{len(h5_bns)} bns)')
    return {'params': params, 'batch_stats': batch_stats}


def _to_mutable(tree):
    if hasattr(tree, 'unfreeze'):
        tree = tree.unfreeze()
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def _get_path(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node
