"""Key serialization — checkpoint/resume of evaluation keys.

The reference relies on TFHEpp+cereal for key files but never calls it
(SURVEY.md §5 "checkpoint/resume"); here it is first-class: a server process
can load an EvalKey (public material only) without ever seeing the secret key.
Format: plain npz with a params-name tag, so files are portable across hosts.
"""
from __future__ import annotations

import numpy as np

from .. import golden as G
from ..params import PRESETS, GateParams


def save_secret_key(path: str, sk: G.SecretKey) -> None:
    np.savez_compressed(path, kind="secret", params=sk.params.name,
                        lvl0=sk.lvl0, lvl1=sk.lvl1)


def load_secret_key(path: str) -> G.SecretKey:
    z = np.load(path, allow_pickle=False)
    assert str(z["kind"]) == "secret", "not a secret key file"
    return G.SecretKey(PRESETS[str(z["params"])], z["lvl0"], z["lvl1"])


def save_eval_key(path: str, ek: G.EvalKey) -> None:
    np.savez_compressed(path, kind="eval", params=ek.params.name,
                        bk=ek.bk, ksk=ek.ksk)


def load_eval_key(path: str) -> G.EvalKey:
    z = np.load(path, allow_pickle=False)
    assert str(z["kind"]) == "eval", "not an eval key file"
    return G.EvalKey(PRESETS[str(z["params"])], z["bk"], z["ksk"])


def save_ciphertexts(path: str, data: np.ndarray, level: int) -> None:
    np.savez_compressed(path, kind="ctxt", level=level, data=data)


def load_ciphertexts(path: str):
    z = np.load(path, allow_pickle=False)
    assert str(z["kind"]) == "ctxt"
    return z["data"], int(z["level"])
