"""Parameter manifests for persisted index artifacts.

Every persisted index in this engine (minhash band index, embedding
band index, LSH-ANN band index) derives rows from SIGNING PARAMETERS
(hash counts, band splits, plane counts, shard counts).  A probe or
append that silently used different parameters than the index was
written with would not error — it would just drop true matches (a
mismatched shard count loses ~half of them).  So each index carries a
``_manifest.json`` sidecar recording its parameters, and every
probe/append resolves its parameters THROUGH the manifest:

- manifest present → manifest wins; an EXPLICITLY passed conflicting
  value raises (silent override would quietly apply different
  parameters than requested);
- no manifest (pre-manifest index) → passed values apply, unset ones
  take the built-in defaults.

Local-path json here; on an object store the same sidecar goes
through the filesystem client.
"""

from __future__ import annotations


def index_manifest(path: str) -> dict:
    """Load an index's parameter manifest (the authoritative signing
    parameters every probe/append must use)."""
    import json
    import os

    mp = os.path.join(path, "_manifest.json")
    if not os.path.exists(mp):  # pre-manifest index: defaults applied
        return {}
    with open(mp) as f:
        return json.load(f)


def write_index_manifest(path: str, params: dict) -> None:
    """Write an index's parameter manifest sidecar."""
    import json
    import os

    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(params, f)


def resolve_signing_params(
    path: str, defaults: dict[str, object], passed: dict[str, object | None]
) -> dict[str, object]:
    """Resolve signing parameters against an index's manifest.

    ``passed`` maps parameter name → caller value (None = not passed).
    See the module docstring for the resolution/refusal rules.
    """
    m = index_manifest(path)
    resolved = {}
    for k, dflt in defaults.items():
        caller = passed.get(k)
        if k in m:
            if caller is not None and caller != m[k]:
                raise ValueError(
                    f"index at {path!r} was written with {k}={m[k]!r} but "
                    f"the caller passed {k}={caller!r}; signing parameters "
                    "come from the index manifest — drop the argument or "
                    "rewrite the index with the new parameters"
                )
            resolved[k] = m[k]
        else:
            resolved[k] = dflt if caller is None else caller
    return resolved
