"""Parameter pytree <-> .npz serialisation.

Nested dicts/lists of arrays are stored flat with '/'-joined key paths
(list indices as decimal segments).  ``None`` dict values (absent optional
biases) are skipped on save and simply absent on load — layer code treats
missing optional keys as None.  ``None`` LIST entries are saved as explicit
markers ('NNNN#none'): positional lists must round-trip at full length
(a silently shortened trailing-None list would desynchronise e.g. a GRU
layer list from its per-layer state).
"""

from __future__ import annotations

from typing import Dict, Union

import numpy as np


def _flatten(tree, prefix: str, out: Dict[str, np.ndarray]) -> None:
    if tree is None:
        return
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}{k}/", out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            if v is None:
                out[f"{prefix}{i:04d}#none"] = np.zeros(0, np.int8)
            else:
                _flatten(v, f"{prefix}{i:04d}#/", out)
    else:
        out[prefix[:-1]] = np.asarray(tree)


def save_params(path, params) -> None:
    flat: Dict[str, np.ndarray] = {}
    _flatten(params, "", flat)
    np.savez(path, **flat)


def load_params(path) -> Dict:
    import jax.numpy as jnp

    data = np.load(path)
    root: Dict = {}
    for key in data.files:
        parts = key.split("/")
        node: Union[Dict, list] = root
        for i, part in enumerate(parts):
            is_leaf = i == len(parts) - 1
            if is_leaf and part.endswith("#none"):
                # explicit None list entry: extend to the index, keep None
                k = int(part[: -len("#none")])
                while len(node) <= k:
                    node.append(None)
                break
            is_index = part.endswith("#")
            k = int(part[:-1]) if is_index else part
            if is_leaf:
                if is_index:
                    while len(node) <= k:
                        node.append(None)
                    node[k] = jnp.asarray(data[key])
                else:
                    node[k] = jnp.asarray(data[key])
            else:
                # '#none' markers are index-like too: a list whose FIRST
                # saved entry is None must still create its parent as a
                # list, not a dict
                nxt_is_index = parts[i + 1].endswith(("#", "#none"))
                if is_index:
                    while len(node) <= k:
                        node.append(None)
                    if node[k] is None:
                        node[k] = [] if nxt_is_index else {}
                    node = node[k]
                else:
                    if k not in node:
                        node[k] = [] if nxt_is_index else {}
                    node = node[k]
    return root
