"""ctypes wrapper over the native DTLS-SRTP helper (native/smelter_dtls/).

The handshake state machine runs in OpenSSL via memory BIOs; Python owns the
(ICE-muxed) UDP socket and shuttles datagrams. On completion the RFC 5764
SRTP keying material is exported for `smelter_tpu.io.webrtc.srtp`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Tuple

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsmelter_dtls.so")

_lib = None
_lock = threading.Lock()
_BUF_CAP = 17000  # > max DTLS flight


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_NATIVE_DIR, "smelter_dtls", "smelter_dtls.cpp")
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
        ):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.sm_dtls_last_error.restype = ctypes.c_char_p
        lib.sm_dtls_do_handshake.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int,
        ]
        lib.sm_dtls_fingerprint.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
        lib.sm_dtls_export_srtp_keys.argtypes = [ctypes.c_int, ctypes.c_char_p]
        _lib = lib
        return lib


class DtlsError(RuntimeError):
    pass


class DtlsEndpoint:
    """One DTLS-SRTP endpoint (server = a=setup:passive side)."""

    def __init__(self, is_server: bool) -> None:
        self._lib = _load()
        self._h = self._lib.sm_dtls_new(1 if is_server else 0)
        if self._h < 0:
            raise DtlsError(self._lib.sm_dtls_last_error().decode())
        self.is_server = is_server
        self._buf = ctypes.create_string_buffer(_BUF_CAP)

    def fingerprint(self) -> str:
        n = self._lib.sm_dtls_fingerprint(self._h, self._buf, _BUF_CAP)
        if n < 0:
            raise DtlsError(self._lib.sm_dtls_last_error().decode())
        return self._buf.raw[:n].decode()

    def handshake(self, incoming: bytes = b"") -> bytes:
        """Feed an incoming datagram (or b'' to kick off the client flight);
        returns bytes to send to the peer (may be empty)."""
        n = self._lib.sm_dtls_do_handshake(
            self._h, incoming, len(incoming), self._buf, _BUF_CAP
        )
        if n < 0:
            raise DtlsError(self._lib.sm_dtls_last_error().decode())
        return self._buf.raw[:n]

    @property
    def established(self) -> bool:
        return self._lib.sm_dtls_is_established(self._h) == 1

    def export_srtp_keys(self) -> Tuple[bytes, bytes, bytes, bytes]:
        """(client_key, server_key, client_salt, server_salt) per RFC 5764."""
        buf = ctypes.create_string_buffer(60)
        n = self._lib.sm_dtls_export_srtp_keys(self._h, buf)
        if n != 60:
            raise DtlsError(self._lib.sm_dtls_last_error().decode())
        material = buf.raw
        return material[0:16], material[16:32], material[32:46], material[46:60]

    def close(self) -> None:
        if self._h >= 0:
            self._lib.sm_dtls_close(self._h)
            self._h = -1

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
