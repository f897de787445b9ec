"""Python-file config system.

Public surface preserved from the reference (/root/reference/util/lazy_load.py:23-75):
a config is an executable ``.py`` file; ``Config(path)`` imports it and exposes
its globals as attributes. The reference's ``partials=`` AST rewrite
(lazy_load.py:77-91) existed to defer torch optimizer construction until the
model exists; in this functional stack configs naturally define factories
(plain callables), so no AST surgery is needed — but ``Config`` still accepts
and ignores a ``partials`` argument for drop-in compatibility.
"""
from __future__ import annotations

import importlib.util
import os
import sys
import uuid
from typing import Optional, Sequence


class Config:
    def __init__(self, file_path: str, partials: Optional[Sequence[str]] = None):
        file_path = os.path.abspath(file_path)
        if not os.path.isfile(file_path):
            raise FileNotFoundError(file_path)
        module_name = f"_rdetr_config_{uuid.uuid4().hex[:8]}"
        spec = importlib.util.spec_from_file_location(module_name, file_path)
        module = importlib.util.module_from_spec(spec)
        sys.modules[module_name] = module
        try:
            spec.loader.exec_module(module)
        finally:
            sys.modules.pop(module_name, None)
        self._file_path = file_path
        for key, value in vars(module).items():
            if not key.startswith("__"):
                setattr(self, key, value)

    def get(self, key, default=None):
        return getattr(self, key, default)

    def __repr__(self):
        return f"Config({self._file_path})"
