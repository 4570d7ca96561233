"""Every [project.scripts] target must resolve to a callable main()."""

import importlib
import re
from pathlib import Path


def test_console_scripts_resolve():
    text = Path(__file__).resolve().parents[1].joinpath("pyproject.toml").read_text()
    block = re.search(r"\[project\.scripts\](.*?)(\n\[|$)", text, re.S).group(1)
    entries = re.findall(r'^[\w-]+\s*=\s*"([\w.]+):(\w+)"', block, re.M)
    assert len(entries) >= 14
    for module, attr in entries:
        mod = importlib.import_module(module)
        assert callable(getattr(mod, attr)), f"{module}:{attr}"
