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


def _collect_flax_units(params: Dict, batch_stats: Dict):
    """Group flax leaves into ordered conv / bn units.

    Returns a list of ('conv', {...paths}) / ('bn', {...paths}) in creation
    order.  A conv unit holds 'kernel' (+ optional 'bias'); a bn unit holds
    'scale', 'bias', 'mean', 'var'.
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
                       verbose: bool = True) -> Dict[str, Any]:
    """Load Keras h5 weights into flax ``{'params', 'batch_stats'}``.

    Conv and BN units are matched in creation order with shape checks;
    mismatches are reported and skipped (reference behavior: by-name ->
    by-position fallback with audit printing).

    Returns new variables (copies; the input is not mutated).
    """
    import copy
    import h5py

    params = copy.deepcopy(_to_mutable(variables['params']))
    batch_stats = copy.deepcopy(
        _to_mutable(variables.get('batch_stats', {})))

    flax_units = _collect_flax_units(params, batch_stats)
    with h5py.File(h5_path, 'r') as f:
        h5_units = _collect_h5_units(f)

    # Biased convs (the predict convs) and bias-free convs (everything
    # ConvBN) are matched as separate ordered streams: Keras names them
    # differently (conv2d_N vs predict_conv_N), which would otherwise
    # scramble the interleaved creation order.
    flax_convs = ([u for u in flax_units
                   if u[0] == 'conv' and 'bias' not in u[1]]
                  + [u for u in flax_units
                     if u[0] == 'conv' and 'bias' in u[1]])
    flax_bns = [u for u in flax_units if u[0] == 'bn']
    h5_convs = ([u for u in h5_units
                 if u[0] == 'conv' and 'bias' not in u[1]]
                + [u for u in h5_units
                   if u[0] == 'conv' and 'bias' in u[1]])
    h5_bns = [u for u in h5_units if u[0] == 'bn']

    loaded = mismatched = 0

    def set_path(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node[p]
        node[path[-1]] = np.asarray(value, np.float32)

    for (kind, fu), (_, hu, lname) in zip(flax_convs, h5_convs):
        target_shape = tuple(_get_path(params, fu['kernel']).shape)
        if tuple(hu['kernel'].shape) != target_shape:
            mismatched += 1
            if verbose:
                print(f'  shape mismatch {lname}: h5 {hu["kernel"].shape} '
                      f'vs flax {target_shape}')
            continue
        set_path(params, fu['kernel'], hu['kernel'])
        if 'bias' in fu and 'bias' in hu:
            set_path(params, fu['bias'], hu['bias'])
        loaded += 1

    for (kind, fu), (_, hu, lname) in zip(flax_bns, h5_bns):
        target_shape = tuple(_get_path(params, fu['scale']).shape)
        if hu['scale'] is None or tuple(hu['scale'].shape) != target_shape:
            mismatched += 1
            continue
        set_path(params, fu['scale'], hu['scale'])
        set_path(params, fu['bias'], hu['bias'])
        # BN moving statistics (the part Keras by-name loading breaks on;
        # reference fixes it manually at multigriddet_darknet.py:229-276)
        if fu['mean'] is not None and hu['mean'] is not None:
            set_path(batch_stats, fu['mean'], hu['mean'])
            set_path(batch_stats, fu['var'], hu['var'])
        loaded += 1

    if verbose:
        print(f'Ported {loaded} units from {h5_path} '
              f'({mismatched} shape mismatches; '
              f'flax: {len(flax_convs)} convs / {len(flax_bns)} bns, '
              f'h5: {len(h5_convs)} convs / {len(h5_bns)} bns)')
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
