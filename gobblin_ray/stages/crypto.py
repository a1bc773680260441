"""Encryption / decryption converter stages (SURVEY §2.3 inventory row).

Gobblin analogs: gobblin-modules/gobblin-crypto(-provider)/ —
``EncryptConverter`` / ``DecryptConverter`` wrap a credential-store-backed
codec around a single record field; ``GPGFileEncryptor`` does whole-file
encryption at the writer. Here the unit is a COLUMN inside an actor-pool
``map_batches`` stage: the cipher object (key schedule) is built once per
actor in ``__init__``, each ``__call__`` transforms one Arrow batch.

Cipher: Fernet (AES-128-CBC + HMAC, from the public ``cryptography``
package) when available — authenticated, versioned, random-IV. Fallback
(import-gated, for environments without the lib): a deterministic
SHA-256-counter keystream XOR with an HMAC tag — NOT industrial crypto,
but format-compatible plumbing so pipelines stay runnable.

Per-row loop note: Fernet is a per-message codec (per-message IV + HMAC),
so the hot loop is per-row by necessity; the actor pool distributes it.
Keys never appear in the Dataset — pass the passphrase at stage
construction (the reference reads them from a credential store)."""

from __future__ import annotations

import base64
import hashlib
import hmac as hmac_mod

import pyarrow as pa

try:  # public `cryptography` package; baked into this environment
    from cryptography.fernet import Fernet

    _HAVE_FERNET = True
except Exception:  # pragma: no cover - fallback path
    _HAVE_FERNET = False


def derive_key(passphrase: str) -> bytes:
    """Passphrase -> urlsafe-base64 32-byte key (Fernet key format)."""
    return base64.urlsafe_b64encode(
        hashlib.sha256(passphrase.encode("utf-8")).digest()
    )


class _KeystreamCodec:
    """Fallback codec: SHA-256 counter-mode keystream XOR + HMAC tag.
    Deterministic given (key, plaintext) — fine for plumbing tests, not a
    substitute for a vetted AEAD."""

    def __init__(self, key: bytes):
        self.key = hashlib.sha256(key).digest()

    def _stream(self, n: int, nonce: bytes) -> bytes:
        out = bytearray()
        ctr = 0
        while len(out) < n:
            out += hashlib.sha256(
                self.key + nonce + ctr.to_bytes(8, "big")
            ).digest()
            ctr += 1
        return bytes(out[:n])

    def encrypt(self, data: bytes) -> bytes:
        nonce = hashlib.sha256(self.key + data).digest()[:12]
        ct = bytes(a ^ b for a, b in zip(data, self._stream(len(data), nonce)))
        tag = hmac_mod.new(self.key, nonce + ct, hashlib.sha256).digest()[:16]
        return nonce + tag + ct

    def decrypt(self, blob: bytes) -> bytes:
        nonce, tag, ct = blob[:12], blob[12:28], blob[28:]
        want = hmac_mod.new(self.key, nonce + ct, hashlib.sha256).digest()[:16]
        if not hmac_mod.compare_digest(tag, want):
            raise ValueError("decrypt: HMAC mismatch (wrong key or corrupt)")
        return bytes(a ^ b for a, b in zip(ct, self._stream(len(ct), nonce)))


def _make_codec(passphrase: str):
    if _HAVE_FERNET:
        return Fernet(derive_key(passphrase))
    return _KeystreamCodec(passphrase.encode("utf-8"))  # pragma: no cover


class EncryptColumn:
    """Actor-pool stage: encrypt a string/binary column into binary.

    >>> ds.map_batches(EncryptColumn,
    ...     fn_constructor_kwargs=dict(column="text", passphrase=...),
    ...     batch_format="pyarrow", concurrency=4)
    """

    def __init__(self, column: str, passphrase: str, out: str | None = None):
        self.column = column
        self.out = out or column
        self.codec = _make_codec(passphrase)  # key schedule once per actor

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t.column(self.column)
        enc = [
            None if v is None else self.codec.encrypt(
                v if isinstance(v, bytes) else str(v).encode("utf-8")
            )
            for v in col.to_pylist()
        ]
        arr = pa.array(enc, pa.binary())
        from .converters import set_or_append

        return set_or_append(t, self.out, arr)


class DecryptColumn:
    """Actor-pool stage: invert ``EncryptColumn``. ``as_string=True``
    decodes the recovered bytes back to utf-8 text."""

    def __init__(self, column: str, passphrase: str, out: str | None = None,
                 as_string: bool = True):
        self.column = column
        self.out = out or column
        self.as_string = as_string
        self.codec = _make_codec(passphrase)

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t.column(self.column)
        dec = [
            None if v is None else self.codec.decrypt(bytes(v))
            for v in col.to_pylist()
        ]
        if self.as_string:
            arr = pa.array(
                [None if v is None else v.decode("utf-8") for v in dec],
                pa.string(),
            )
        else:
            arr = pa.array(dec, pa.binary())
        from .converters import set_or_append

        return set_or_append(t, self.out, arr)
