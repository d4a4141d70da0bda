"""The repo must keep passing its own scale-discipline audit."""

import importlib.util
import os


def test_scale_audit_clean():
    path = os.path.join(os.path.dirname(__file__), "..", "tools", "audit_scale.py")
    spec = importlib.util.spec_from_file_location("audit_scale", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.audit() == []
