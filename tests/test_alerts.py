"""Failure alerting (pipeline/alerts.py): retry-then-notify semantics
mirroring the reference scheduler's per-task policy (retries +
email_on_failure), with the SMTP transport exercised over a real
loopback socket."""

from __future__ import annotations

import json
import socket
import threading

import pytest

from funding_monitoring_spark.pipeline.alerts import (
    AlertPolicy,
    file_notifier,
    run_task,
    smtp_notifier,
)


def test_retry_then_success_never_notifies(tmp_path):
    calls = []
    ledger = str(tmp_path / "alerts.jsonl")

    def flaky():
        calls.append(1)
        if len(calls) < 2:
            raise RuntimeError("transient")
        return 42

    policy = AlertPolicy(retries=1, notifiers=[file_notifier(ledger)])
    assert run_task("t", flaky, policy) == 42
    assert len(calls) == 2
    import os

    assert not os.path.exists(ledger)  # success: no alert written


def test_final_failure_notifies_and_reraises(tmp_path):
    ledger = str(tmp_path / "alerts.jsonl")

    def broken():
        raise ValueError("store unreachable")

    policy = AlertPolicy(retries=2, notifiers=[file_notifier(ledger)])
    with pytest.raises(ValueError, match="store unreachable"):
        run_task("update_funding_data", broken, policy)
    rows = [json.loads(l) for l in open(ledger)]
    assert len(rows) == 1
    a = rows[0]
    assert a["task"] == "update_funding_data"
    assert a["attempts"] == 3
    assert a["error_type"] == "ValueError"
    assert "store unreachable" in a["error"]


def test_broken_notifier_does_not_mask_task_error():
    def broken():
        raise ValueError("real failure")

    def bad_notifier(alert):
        raise OSError("smtp down")

    policy = AlertPolicy(retries=0, notifiers=[bad_notifier])
    with pytest.raises(ValueError, match="real failure"):
        run_task("t", broken, policy)


class _LoopbackSmtp(threading.Thread):
    """Minimal RFC 5321 responder: accepts one session, records the
    DATA payload — proves smtplib speaks the real wire protocol."""

    def __init__(self) -> None:
        super().__init__(daemon=True)
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.payload = b""

    def run(self) -> None:
        conn, _ = self.sock.accept()
        fh = conn.makefile("rwb")

        def send(line: bytes) -> None:
            fh.write(line + b"\r\n")
            fh.flush()

        send(b"220 loopback ESMTP")
        in_data = False
        body = []
        while True:
            line = fh.readline()
            if not line:
                break
            if in_data:
                if line.rstrip(b"\r\n") == b".":
                    self.payload = b"".join(body)
                    in_data = False
                    send(b"250 OK")
                else:
                    body.append(line)
                continue
            cmd = line.rstrip(b"\r\n").upper()
            if cmd.startswith((b"EHLO", b"HELO")):
                send(b"250 loopback")
            elif cmd.startswith((b"MAIL FROM", b"RCPT TO")):
                send(b"250 OK")
            elif cmd == b"DATA":
                send(b"354 go ahead")
                in_data = True
            elif cmd == b"QUIT":
                send(b"221 bye")
                break
            else:
                send(b"250 OK")
        conn.close()


def test_smtp_notifier_delivers_over_loopback():
    server = _LoopbackSmtp()
    server.start()

    def broken():
        raise RuntimeError("tick failed")

    policy = AlertPolicy(
        retries=0,
        notifiers=[
            smtp_notifier(
                "127.0.0.1",
                server.port,
                sender="engine@localhost",
                recipients=["oncall@localhost"],
            )
        ],
    )
    with pytest.raises(RuntimeError, match="tick failed"):
        run_task("update_funding_stats", broken, policy)
    server.join(timeout=5)
    text = server.payload.decode()
    assert "update_funding_stats" in text
    assert "RuntimeError" in text
    assert "Subject: [pipeline failure]" in text


def test_keyboard_interrupt_propagates_unretried(tmp_path):
    """BaseException (KeyboardInterrupt/SystemExit) must propagate
    immediately: no retry, no sleep, no failure notification."""
    ledger = str(tmp_path / "alerts.jsonl")
    calls = []

    def interrupted():
        calls.append(1)
        raise KeyboardInterrupt

    policy = AlertPolicy(
        retries=3, retry_delay_s=60.0, notifiers=[file_notifier(ledger)]
    )
    with pytest.raises(KeyboardInterrupt):
        run_task("t", interrupted, policy)
    assert len(calls) == 1  # not retried (and no 60s sleeps)
    import os

    assert not os.path.exists(ledger)  # no alert for an interrupt
