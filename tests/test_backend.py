"""utils/backend.py — transfer-journal bounding semantics.

The actual RSS behavior is measured on the live backend by
tools/probe_hostmem.py; these tests pin the env-var contract (default on,
user override respected) that every long-running CLI relies on.
"""

import os

from aclgan_tpu.utils.backend import bound_transfer_journal


def _with_env(value, fn):
    old = os.environ.pop("AXON_JOURNAL_COMPACT", None)
    try:
        if value is not None:
            os.environ["AXON_JOURNAL_COMPACT"] = value
        return fn()
    finally:
        if old is None:
            os.environ.pop("AXON_JOURNAL_COMPACT", None)
        else:
            os.environ["AXON_JOURNAL_COMPACT"] = old


def test_defaults_on_when_unset():
    def body():
        assert bound_transfer_journal() is True
        return os.environ["AXON_JOURNAL_COMPACT"]

    assert _with_env(None, body) == "1"


def test_user_opt_out_respected():
    def body():
        assert bound_transfer_journal() is False
        return os.environ["AXON_JOURNAL_COMPACT"]

    assert _with_env("0", body) == "0"
    assert _with_env("", lambda: bound_transfer_journal()) is False
    # common falsy spellings also report as opted-out (ADVICE r4): the env
    # var is left exactly as the user set it, but the return must not claim
    # the journal is bounded
    for v in ("false", "no", "off", "FALSE", "Off", " 0 "):
        assert _with_env(v, lambda: bound_transfer_journal()) is False


def test_user_opt_in_untouched():
    def body():
        assert bound_transfer_journal() is True
        return os.environ["AXON_JOURNAL_COMPACT"]

    assert _with_env("1", body) == "1"
