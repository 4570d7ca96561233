"""Config system: YAML single-source with ${VAR:default} env expansion and
typed dot access.

Re-expresses the reference's config contract (reference src/config.py:100-231):
  * one YAML file is the single source of truth,
  * ``${VAR}`` / ``${VAR:default}`` placeholders are expanded from the
    environment at load time (``PROJECT_ROOT`` is always defined),
  * values are exposed with attribute access (``config.qpp.default_index``),
  * a ``get_qpp_index`` helper resolves weighted-fusion QPP model names via the
    ``method_index`` table (reference src/config.py + defaults.yaml:180-197).

Differences from the reference: no JVM/torch/OMP environment mutation is
needed (there are no foreign runtimes to configure), and the singleton is
reloadable for tests.
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional

import yaml

# Default part excludes braces so innermost placeholders expand first;
# _expand iterates to a fixpoint, supporting ${A:${B}/suffix} nesting.
_PLACEHOLDER = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)(?::([^{}]*))?\}")

PROJECT_ROOT = Path(__file__).resolve().parent.parent
# repo checkout layout first; wheel installs fall back to the packaged copy
_REPO_CONFIG = PROJECT_ROOT / "config" / "defaults.yaml"
_PACKAGED_CONFIG = Path(__file__).resolve().parent / "defaults.yaml"
DEFAULT_CONFIG_PATH = _REPO_CONFIG if _REPO_CONFIG.exists() else _PACKAGED_CONFIG


def _expand(value: str, env: Dict[str, str]) -> str:
    """Expand ${VAR} / ${VAR:default} placeholders, innermost first.
    Capped at 10 rewrite passes: a self-referential env var (LOOP='x${LOOP}')
    must fail loudly instead of hanging package import."""
    prev = None
    for _ in range(10):
        if prev == value:
            break
        prev = value

        def repl(m: "re.Match[str]") -> str:
            var, default = m.group(1), m.group(2)
            if var in env:
                return env[var]
            if default is not None:
                return default
            return m.group(0)  # leave unresolved placeholders intact

        value = _PLACEHOLDER.sub(repl, value)
    else:
        if _PLACEHOLDER.search(value):
            raise ValueError(
                f"environment placeholder expansion did not converge for {value!r}"
            )
    return value


def _expand_tree(node: Any, env: Dict[str, str]) -> Any:
    if isinstance(node, str):
        return _expand(node, env)
    if isinstance(node, dict):
        return {k: _expand_tree(v, env) for k, v in node.items()}
    if isinstance(node, list):
        return [_expand_tree(v, env) for v in node]
    return node


class ConfigDict:
    """Read-only dict wrapper with attribute access and dict-style access."""

    __slots__ = ("_data",)

    def __init__(self, data: Dict[str, Any]):
        object.__setattr__(self, "_data", data)

    def __getattr__(self, name: str) -> Any:
        try:
            return self._wrap(self._data[name])
        except KeyError as e:
            raise AttributeError(f"config has no key {name!r}; available: {sorted(self._data)}") from e

    def __getitem__(self, name: str) -> Any:
        return self._wrap(self._data[name])

    def __contains__(self, name: str) -> bool:
        return name in self._data

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def get(self, name: str, default: Any = None) -> Any:
        return self._wrap(self._data.get(name, default))

    def keys(self):
        return self._data.keys()

    def items(self):
        return ((k, self._wrap(v)) for k, v in self._data.items())

    def to_dict(self) -> Dict[str, Any]:
        return dict(self._data)

    @staticmethod
    def _wrap(v: Any) -> Any:
        return ConfigDict(v) if isinstance(v, dict) else v

    def __setattr__(self, name: str, value: Any) -> None:
        raise AttributeError("config is read-only; use Config.load(overrides=...) in tests")

    def __repr__(self) -> str:
        return f"ConfigDict({sorted(self._data)})"


class Config(ConfigDict):
    """Root config object. Loaded once at import; reloadable via Config.load()."""

    def __init__(self, data: Dict[str, Any], path: Optional[Path] = None):
        super().__init__(data)
        object.__setattr__(self, "_path", path)

    @classmethod
    def load(
        cls,
        path: Optional[os.PathLike] = None,
        overrides: Optional[Dict[str, Any]] = None,
    ) -> "Config":
        path = Path(path or os.environ.get("QPP_CONFIG", DEFAULT_CONFIG_PATH))
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        env = dict(os.environ)
        env.setdefault("PROJECT_ROOT", str(PROJECT_ROOT))
        data = _expand_tree(raw, env)
        if overrides:
            data = _deep_merge(data, overrides)
        return cls(data, path=path)

    # -- domain helpers -------------------------------------------------

    # Reference-style weighted-fusion names -> this framework's kernel
    # column names (ops/qpp.py METHOD_NAMES == qpp.methods order). The
    # reference's method_index table (defaults.yaml:180-193) indexes ITS OWN
    # .qpp column layout, which differs from this kernel's — resolving names
    # through it would silently pick the wrong statistic for every name
    # except RSD.
    _QPP_NAME_ALIASES = {
        "sigma_max": "sigmamax",
        "sigma(%)": "sigmax",
        "scnqc": "snqc",
    }

    def get_qpp_index(self, model_name: str, layout: str = "kernel") -> int:
        """Resolve a weighted-fusion QPP model name (e.g. 'RSD') to its
        column; 'fusion' means average-all (-1).

        layout="kernel" (default): THIS framework's .qpp layout (the
        kernel's method order, config qpp.methods). layout="reference":
        the reference's method_index table, for weighting by .qpp files
        the REFERENCE produced (their columns differ; only RSD happens to
        share index 5). Reference semantics: src/fusion.py:160-163.
        """
        key = model_name.lower()
        if key == "fusion":
            return -1
        if layout == "reference":
            table = self.qpp.method_index.to_dict()
            if model_name in table:
                return int(table[model_name])
            # case-insensitive fallback: the kernel layout lowercases, so
            # '--qpp-model rsd' must not fail only under this layout
            lowered = {str(k).lower(): v for k, v in table.items()}
            if key in lowered:
                return int(lowered[key])
            raise KeyError(
                f"Unknown reference QPP model {model_name!r}; known: {sorted(table)}"
            )
        key = self._QPP_NAME_ALIASES.get(key, key)
        methods = [str(m).lower() for m in self.qpp.methods]
        if key in methods:
            return methods.index(key)
        raise KeyError(
            f"Unknown QPP model {model_name!r}; known: {sorted(set(methods))}"
        )

    def dataset(self, name: str) -> ConfigDict:
        if name not in self.datasets.supported:
            raise KeyError(f"Unsupported dataset {name!r}; supported: {self.datasets.supported}")
        return self.datasets[name]


def _deep_merge(base: Dict[str, Any], extra: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(base)
    for k, v in extra.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def detect_dataset(path: os.PathLike, supported: Optional[List[str]] = None) -> Optional[str]:
    """Infer dataset name from a path (reference src/config.py:431)."""
    supported = supported or list(config.datasets.supported)
    parts = [p.lower() for p in Path(path).parts]
    for name in supported:
        if any(name == p or f"beir-{name}" == p for p in parts):
            return name
    # fallback: boundary-delimited substring, longest name wins (plain
    # substring matching returned 'nq' for paths like /home/tanq/...)
    s = str(path).lower()
    hits = [
        name for name in supported
        if re.search(rf"(?<![a-z0-9]){re.escape(name)}(?![a-z0-9])", s)
    ]
    return max(hits, key=len) if hits else None


config = Config.load()
