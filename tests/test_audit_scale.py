"""The repo must keep passing its own scale-discipline audit."""


def test_scale_audit_clean():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import audit_scale

    assert audit_scale.audit() == []
