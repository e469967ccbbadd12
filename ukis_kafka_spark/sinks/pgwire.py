"""Minimal pure-Python PostgreSQL client — just enough DB-API for the
sink writers, with zero native dependencies.

The container has a real ``postgres`` 15 server binary but no DB-API
driver (psycopg2 is absent and installs are off-limits), which left
the sink's online twin permanently skipped.  The PostgreSQL
frontend/backend protocol v3 is public and stable (documented at
https://www.postgresql.org/docs/current/protocol.html), and the sink
only needs the SIMPLE QUERY subset over trust auth:

- StartupMessage(user, database) -> AuthenticationOk('R',0) ->
  ParameterStatus*/BackendKeyData -> ReadyForQuery('Z')
- Query('Q') -> [RowDescription('T') DataRow('D')*] CommandComplete('C')
  / ErrorResponse('E') -> ReadyForQuery('Z')

Parameters are interpolated client-side exactly like psycopg2's
``%s`` paramstyle (values are escaped as SQL literals — strings with
'' doubling, bytes as ``'\\x...'::bytea`` hex, None as NULL); result
fields come back as protocol text (``bytea`` reads as ``\\x…`` hex —
``unhex_bytea`` decodes it).  ``with conn:`` wraps a transaction
(BEGIN / COMMIT-or-ROLLBACK), matching how the sink drives psycopg2.

This is deliberately NOT a general driver: no extended protocol, no
TLS/MD5/SCRAM auth, no COPY — trust-auth test/dev clusters only. The
production path remains any full DB-API driver; ``postgis_batch_writer``
takes a connection factory and cannot tell the difference.
"""

from __future__ import annotations

import socket
import struct


class PgError(Exception):
    """Server ErrorResponse, message fields joined."""


def _quote(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, (bytes, bytearray, memoryview)):
        return "'\\x" + bytes(v).hex() + "'::bytea"
    s = str(v)
    if "\x00" in s:
        raise ValueError("NUL byte in SQL literal")
    return "'" + s.replace("'", "''") + "'"


def unhex_bytea(text_field: str) -> bytes:
    """Decode a text-format bytea result field (``\\x…`` hex)."""
    if not text_field.startswith("\\x"):
        raise ValueError(f"not a hex bytea field: {text_field[:20]!r}")
    return bytes.fromhex(text_field[2:])


class _Cursor:
    def __init__(self, conn: "PgConnection"):
        self._conn = conn
        self._rows: list[tuple] = []
        self.description = None
        self.rowcount = -1

    def execute(self, sql: str, params=None):
        if params is not None:
            sql = sql % tuple(_quote(p) for p in params)
        self._rows, self.description, self.rowcount = self._conn._query(sql)
        self._idx = 0
        return self

    def fetchone(self):
        if self._idx >= len(self._rows):
            return None
        row = self._rows[self._idx]
        self._idx += 1
        return row

    def fetchall(self):
        rows = self._rows[self._idx :]
        self._idx = len(self._rows)
        return rows

    def close(self):
        self._rows = []


class PgConnection:
    def __init__(self, host: str, port: int, user: str, database: str,
                 timeout: float = 10.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._buf = b""
        params = f"user\0{user}\0database\0{database}\0\0".encode()
        body = struct.pack("!i", 196608) + params  # protocol 3.0
        self._sock.sendall(struct.pack("!i", len(body) + 4) + body)
        # drain until ReadyForQuery; trust auth sends R(0) first
        while True:
            t, payload = self._recv()
            if t == b"R":
                (code,) = struct.unpack("!i", payload[:4])
                if code != 0:
                    raise PgError(
                        f"server requires auth method {code}; this client "
                        "speaks trust auth only"
                    )
            elif t == b"E":
                raise PgError(_err_text(payload))
            elif t == b"Z":
                break

    # ---- protocol plumbing ------------------------------------------
    def _recv(self):
        while len(self._buf) < 5:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise PgError("server closed connection")
            self._buf += chunk
        t = self._buf[:1]
        (ln,) = struct.unpack("!i", self._buf[1:5])
        need = 1 + ln
        while len(self._buf) < need:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise PgError("server closed connection mid-message")
            self._buf += chunk
        payload = self._buf[5:need]
        self._buf = self._buf[need:]
        return t, payload

    def _query(self, sql: str):
        q = sql.encode() + b"\0"
        self._sock.sendall(b"Q" + struct.pack("!i", len(q) + 4) + q)
        rows: list[tuple] = []
        description = None
        rowcount = -1
        error = None
        while True:
            t, payload = self._recv()
            if t == b"T":
                description = _parse_row_description(payload)
            elif t == b"D":
                rows.append(_parse_data_row(payload))
            elif t == b"C":
                tag = payload.rstrip(b"\0").decode()
                parts = tag.split(" ")
                if parts and parts[-1].isdigit():
                    rowcount = int(parts[-1])
            elif t == b"E":
                error = _err_text(payload)  # Z still follows
            elif t in (b"N", b"S", b"I", b"K"):
                pass  # notice / parameter status / empty / key data
            elif t == b"Z":
                break
        if error is not None:
            raise PgError(error)
        return rows, description, rowcount

    # ---- DB-API surface ---------------------------------------------
    def cursor(self) -> _Cursor:
        return _Cursor(self)

    def commit(self):
        self._query("COMMIT")

    def rollback(self):
        self._query("ROLLBACK")

    def close(self):
        try:
            self._sock.sendall(b"X" + struct.pack("!i", 4))  # Terminate
        except OSError:
            pass
        self._sock.close()

    def __enter__(self):
        self._query("BEGIN")
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            self._query("COMMIT")
        else:
            self._query("ROLLBACK")
        return False


def _parse_row_description(payload: bytes):
    (n,) = struct.unpack("!h", payload[:2])
    off = 2
    desc = []
    for _ in range(n):
        end = payload.index(b"\0", off)
        name = payload[off:end].decode()
        off = end + 1 + 18  # table oid(4) attnum(2) type oid(4) len(2) mod(4) fmt(2)
        desc.append((name, None, None, None, None, None, None))
    return desc


def _parse_data_row(payload: bytes) -> tuple:
    (n,) = struct.unpack("!h", payload[:2])
    off = 2
    vals = []
    for _ in range(n):
        (ln,) = struct.unpack("!i", payload[off : off + 4])
        off += 4
        if ln == -1:
            vals.append(None)
        else:
            vals.append(payload[off : off + ln].decode())
            off += ln
    return tuple(vals)


def _err_text(payload: bytes) -> str:
    fields = {}
    for part in payload.split(b"\0"):
        if part:
            fields[chr(part[0])] = part[1:].decode(errors="replace")
    return f"{fields.get('S', 'ERROR')}: {fields.get('M', '?')} ({fields.get('C', '')})"


def connect(host: str = "127.0.0.1", port: int = 5432, user: str = "ukis",
            database: str = "postgres") -> PgConnection:
    return PgConnection(host, port, user, database)
