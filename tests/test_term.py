"""Terminal introspection tests over a scripted pty (the fake-tty
harness SURVEY §4 calls for: scripted query -> response)."""

from __future__ import annotations

import os
import pty
import re
import threading

import pytest


def _run_with_pty(responder, fn):
    """Run fn() with stdout attached to a pty whose master side answers
    escape queries via `responder(received_bytes) -> reply_bytes`."""
    master, slave = pty.openpty()
    done = threading.Event()

    def pump():
        buf = b""
        while not done.is_set():
            try:
                data = os.read(master, 256)
            except OSError:
                break
            if not data:
                break
            buf += data
            reply = responder(buf)
            if reply:
                os.write(master, reply)
                buf = b""

    t = threading.Thread(target=pump, daemon=True)
    t.start()
    import sys
    saved = os.dup(1)
    try:
        os.dup2(slave, 1)
        result = fn()
    finally:
        os.dup2(saved, 1)
        os.close(saved)
        done.set()
        os.close(master)
        os.close(slave)
    return result


def test_query_background_color():
    from timg_tpu import term

    def responder(buf):
        if b"\033]11;?" in buf:
            return b"\033]11;rgb:1212/3434/5656\033\\"
        return b""

    result = _run_with_pty(responder, term.query_background_color)
    assert result == "#123456"


def test_query_graphics_protocol_kitty_via_query():
    from timg_tpu import term

    def responder(buf):
        if b"\033[>q" in buf:
            return b"\033P>|kitty 0.32.1\033\\\033[0n"
        return b""

    env_backup = {k: os.environ.pop(k, None)
                  for k in ("TERM", "TERM_PROGRAM", "TMUX")}
    try:
        os.environ["TERM"] = "xterm-256color"
        info = _run_with_pty(responder,
                             term.query_supported_graphics_protocol)
    finally:
        for k, v in env_backup.items():
            if v is not None:
                os.environ[k] = v
    assert info.preferred_graphics == "kitty"


def test_term_env_hint_kitty(monkeypatch):
    from timg_tpu import term

    monkeypatch.setenv("TERM", "xterm-kitty")
    monkeypatch.delenv("TMUX", raising=False)
    info = term.query_supported_graphics_protocol()
    assert info.preferred_graphics == "kitty"


def test_cell_size_query():
    from timg_tpu import term

    def responder(buf):
        if b"\033[16t" in buf:
            return b"\033[6;18;9t"
        return b""

    result = _run_with_pty(responder, term.determine_term_size)
    # pty reports 0x0 winsize -> pixel fallback path used
    assert result.font_height_px == 18
    assert result.font_width_px == 9


def test_sixel_quirk_env(monkeypatch):
    """TIMG_SIXEL_NEWLINE_WORKAROUND seeds the INITIAL quirk values
    (ref term-query.cc:229-231) -- terminal detection can still turn
    quirks on afterwards (:310-316)."""
    from timg_tpu import term

    monkeypatch.setenv("TIMG_SIXEL_NEWLINE_WORKAROUND", "3")
    monkeypatch.setenv("TERM", "xterm-256color")
    monkeypatch.delenv("TERM_PROGRAM", raising=False)
    monkeypatch.setattr(term, "query_terminal", lambda *a, **k: b"")
    info = term.query_supported_graphics_protocol()
    assert info.sixel.known_broken_cursor_placement
    assert info.sixel.full_cell_jump

    # An explicit 0 must not veto detection: WindowsTerminal still
    # gets both quirks from its CSI >q response.
    monkeypatch.setenv("TIMG_SIXEL_NEWLINE_WORKAROUND", "0")
    monkeypatch.setattr(
        term, "query_terminal",
        lambda *a, **k: b"\033P>|WindowsTerminal\033\\\033[0n")
    info = term.query_supported_graphics_protocol()
    assert info.sixel.known_broken_cursor_placement
    assert info.sixel.full_cell_jump


def test_graphics_detection_reference_table(monkeypatch):
    """Env-hint arm of the detection table matches the reference
    (ref term-query.cc:239-260): Warp -> iterm2; vscode -> iterm2 with
    the broken-cursor sixel quirk."""
    from timg_tpu import term

    monkeypatch.setenv("TERM", "xterm-256color")
    monkeypatch.delenv("TMUX", raising=False)
    monkeypatch.setattr(term, "query_terminal", lambda *a, **k: b"")

    monkeypatch.setenv("TERM_PROGRAM", "WarpTerminal")
    info = term.query_supported_graphics_protocol()
    assert info.preferred_graphics == "iterm2"
    assert not info.sixel.known_broken_cursor_placement

    monkeypatch.setenv("TERM_PROGRAM", "vscode")
    info = term.query_supported_graphics_protocol()
    assert info.preferred_graphics == "iterm2"
    assert info.sixel.known_broken_cursor_placement


def test_graphics_detection_response_table(monkeypatch):
    """Version-response arm (ref term-query.cc:277-316): Konsole 2 ->
    iterm2 (not sixel); foot -> sixel + broken cursor; WindowsTerminal
    -> both sixel quirks."""
    from timg_tpu import term

    monkeypatch.setenv("TERM", "xterm-256color")
    monkeypatch.delenv("TERM_PROGRAM", raising=False)
    monkeypatch.delenv("TMUX", raising=False)

    cases = [
        (b"\033P>|Konsole 20.08.1\033\\", "iterm2", False, False),
        (b"\033P>|foot(1.16.2)\033\\", "sixel", True, False),
        (b"\033P>|WindowsTerminal 1.22\033\\", "none", True, True),
    ]
    for resp, want_gfx, want_broken, want_jump in cases:
        monkeypatch.setattr(term, "query_terminal",
                            lambda *a, _r=resp, **k: _r)
        info = term.query_supported_graphics_protocol()
        assert info.preferred_graphics == want_gfx, resp
        assert info.sixel.known_broken_cursor_placement == want_broken
        assert info.sixel.full_cell_jump == want_jump, resp


def test_da1_sixel_fallback_without_xterm_version():
    """A terminal that answers nothing recognizable to CSI >q but
    reports ';4' in DA1 must be detected as sixel (the reference
    probes DA1 whenever the protocol is still unknown,
    ref term-query.cc:320-343) -- with no cursor quirk, which only the
    XTerm version match sets."""
    from timg_tpu import term

    def responder(buf):
        if b"\033[>q" in buf:
            return b"\033[0n"
        if b"\033[c" in buf:
            return b"\033[?64;4;22c"
        return b""

    env_backup = {k: os.environ.pop(k, None)
                  for k in ("TERM", "TERM_PROGRAM", "TMUX")}
    try:
        os.environ["TERM"] = "vt340"
        info = _run_with_pty(responder,
                             term.query_supported_graphics_protocol)
    finally:
        for k, v in env_backup.items():
            if v is not None:
                os.environ[k] = v
    assert info.preferred_graphics == "sixel"
    assert not info.sixel.known_broken_cursor_placement


def test_xterm_quirk_applies_with_da1_sixel():
    """An XTerm version response flags the cursor-placement quirk
    unconditionally (ref term-query.cc:300-303) while the protocol
    stays undecided until the DA1 ';4' capability probe answers
    (ref :320-343).  (There is no TERM=xterm-sixel env hint: the
    reference only trusts very specific env values, :239-260.)"""
    from timg_tpu import term

    def responder(buf):
        if b"\033[>q" in buf:
            return b"\033P>|XTerm(370)\033\\\033[0n"
        if b"\033[c" in buf:
            return b"\033[?63;4;22c"
        return b""

    env_backup = {k: os.environ.pop(k, None)
                  for k in ("TERM", "TERM_PROGRAM", "TMUX")}
    try:
        os.environ["TERM"] = "xterm-256color"
        info = _run_with_pty(responder,
                             term.query_supported_graphics_protocol)
    finally:
        for k, v in env_backup.items():
            if v is not None:
                os.environ[k] = v
    assert info.preferred_graphics == "sixel"
    assert info.sixel.known_broken_cursor_placement


def test_query_parsers_survive_garbage_responses():
    """A hostile/buggy terminal answering queries with garbage must
    never crash the query engine (ref term-query.cc parses responses
    with bounded finders and a select() deadline); every query returns
    its not-found default. Fixed-seed random replies including escape
    soup, binary junk, truncated CSI/OSC prefixes and oversized
    floods."""
    import numpy as np

    from timg_tpu import term

    rng = np.random.default_rng(17)
    payloads = [
        bytes(rng.integers(0, 256, 64, dtype=np.uint8)),
        b"\033[" * 40,
        b"\033]11;rgb:zz/zz/zz\033\\",
        b"\033]11;rgb:12" ,                      # truncated OSC 11
        b"\033[>qqqqqq",
        b"\033P>|\033\\",                        # empty DA3-ish
        b"\033[?;;;c",
        b"\033[6;;t",
        bytes(rng.integers(0, 256, 4096, dtype=np.uint8)),  # flood
        b"\xff\xfe\x00\x01" * 32,
    ]
    for junk in payloads:
        def responder(buf, junk=junk):
            return junk

        def run():
            # the three tty round-trips the CLI performs
            bg = term.query_background_color()
            ginfo = term.query_supported_graphics_protocol()
            size = term.determine_term_size()
            return bg, ginfo, size

        bg, ginfo, size = _run_with_pty(responder, run)
        assert ginfo.preferred_graphics in (None, "", "none", "kitty",
                                            "sixel", "iterm2")
        assert isinstance(size.cols, int)
