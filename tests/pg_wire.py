"""Minimal PostgreSQL v3 wire-protocol client (simple query, trust auth).

No Python PG driver ships in this container and Spark's JDBC path needs
a Java driver jar that is equally absent — but the *dialect risk* of the
warehouse upsert (operators/jdbc.py builds PostgreSQL ``ON CONFLICT``
statements the Derby-backed tests can only text-pin) is testable with
nothing more than a socket: the simple-query flavor of the protocol is
a handful of framed messages. This client speaks exactly enough of it
to execute DDL/DML/SELECT against a local trust-auth server over a unix
socket and return text-format rows.

Protocol per the public PostgreSQL frontend/backend documentation:
StartupMessage(196608, user/database) → 'R' AuthenticationOk → … → 'Z'
ReadyForQuery; then 'Q' simple queries answered by 'T' RowDescription /
'D' DataRow / 'C' CommandComplete / 'E' ErrorResponse, ending in 'Z'.
"""

from __future__ import annotations

import socket
import struct


class PgError(Exception):
    pass


class PgWire:
    def __init__(self, sock_dir: str, port: int = 5432, user: str = "postgres",
                 database: str = "postgres") -> None:
        self._s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._s.connect(f"{sock_dir}/.s.PGSQL.{port}")
        params = (
            b"user\x00" + user.encode() + b"\x00"
            b"database\x00" + database.encode() + b"\x00\x00"
        )
        payload = struct.pack(">I", 196608) + params
        self._s.sendall(struct.pack(">I", len(payload) + 4) + payload)
        # drain startup: R (auth), S (params), K (backend key) … until Z
        while True:
            t, body = self._recv()
            if t == b"R":
                (code,) = struct.unpack(">I", body[:4])
                if code != 0:
                    raise PgError(f"auth method {code} unsupported (need trust)")
            elif t == b"E":
                raise PgError(_err_text(body))
            elif t == b"Z":
                break

    def _recv(self) -> tuple[bytes, bytes]:
        t = self._read(1)
        (n,) = struct.unpack(">I", self._read(4))
        return t, self._read(n - 4)

    def _read(self, n: int) -> bytes:
        out = b""
        while len(out) < n:
            chunk = self._s.recv(n - len(out))
            if not chunk:
                raise PgError("connection closed mid-message")
            out += chunk
        return out

    def query(self, sql: str) -> list[tuple[str | None, ...]]:
        """Run one simple query; text-format rows (None for NULL)."""
        q = sql.encode() + b"\x00"
        self._s.sendall(b"Q" + struct.pack(">I", len(q) + 4) + q)
        rows: list[tuple[str | None, ...]] = []
        err: str | None = None
        while True:
            t, body = self._recv()
            if t == b"D":
                (ncols,) = struct.unpack(">H", body[:2])
                pos, vals = 2, []
                for _ in range(ncols):
                    (ln,) = struct.unpack(">i", body[pos : pos + 4])
                    pos += 4
                    if ln < 0:
                        vals.append(None)
                    else:
                        vals.append(body[pos : pos + ln].decode())
                        pos += ln
                rows.append(tuple(vals))
            elif t == b"E":
                err = _err_text(body)
            elif t == b"Z":
                if err:
                    raise PgError(err)
                return rows
            # 'T' row description / 'C' command complete / 'N' notice:
            # nothing to retain for these tests

    def close(self) -> None:
        try:
            self._s.sendall(b"X" + struct.pack(">I", 4))
        finally:
            self._s.close()


def _err_text(body: bytes) -> str:
    fields = {}
    for part in body.split(b"\x00"):
        if part:
            fields[chr(part[0])] = part[1:].decode(errors="replace")
    return fields.get("M", "unknown postgres error")
