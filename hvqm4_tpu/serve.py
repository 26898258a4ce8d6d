"""Decode service: a long-running socket server over the TPU pipeline.

Minimal production-shaped serving surface (ROADMAP §7): clients submit
`.h4m` clips over TCP and stream back decoded frames (YUV or RGB) or ViT
embeddings, while the server keeps one warm `DecoderSession`-compatible
state per sequence shape (compilations amortize across requests via the
persistent cache).

Protocol (all integers little-endian u32):
    request:  [4: magic 'H4MQ'][4: mode][4: clip_len][clip bytes]
              mode 0 = YUV frames, 1 = RGB frames, 2 = ViT embeddings
    response: [4: magic 'H4MR'][4: status][4: n_chunks]
              then per chunk: [4: len][payload]
              status 0 = ok; 1 = error (single chunk = UTF-8 message)

Run:  python -m hvqm4_tpu.serve --port 8907
Client helper: `decode_remote(host, port, clip, mode)`.
"""

from __future__ import annotations

import argparse
import socket
import socketserver
import struct
import sys

import numpy as np

MAGIC_Q = b"H4MQ"
MAGIC_R = b"H4MR"

MODE_YUV, MODE_RGB, MODE_EMBED = 0, 1, 2


def _recv_exact(sock, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed mid-message")
        buf += chunk
    return buf


class _Handler(socketserver.BaseRequestHandler):
    def handle(self) -> None:  # one request per connection
        try:
            head = _recv_exact(self.request, 12)
            magic, mode, clip_len = head[:4], *struct.unpack("<II", head[4:])
            if magic != MAGIC_Q:
                raise ValueError("bad request magic")
            if mode not in (MODE_YUV, MODE_RGB, MODE_EMBED):
                raise ValueError(f"bad mode {mode}")
            if clip_len > self.server.max_clip_bytes:
                raise ValueError("clip too large")
            clip = _recv_exact(self.request, clip_len)
            chunks = self.server.decode(clip, mode)
            self.request.sendall(MAGIC_R + struct.pack("<II", 0, len(chunks)))
            for c in chunks:
                self.request.sendall(struct.pack("<I", len(c)) + c)
        except Exception as e:  # controlled error response, keep serving
            msg = str(e).encode()[:1000]
            try:
                self.request.sendall(MAGIC_R + struct.pack("<II", 1, 1)
                                     + struct.pack("<I", len(msg)) + msg)
            except OSError:
                pass


class DecodeServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, addr, backend: str = "jax",
                 max_clip_bytes: int = 256 << 20, vit_cfg=None):
        super().__init__(addr, _Handler)
        self.backend = backend
        self.max_clip_bytes = max_clip_bytes
        self._sessions: dict = {}
        self._vit = None
        self._vit_cfg = vit_cfg
        import threading

        self._lock = threading.Lock()  # one decode at a time per device

    def _session(self, cfg):
        from .session import DecoderSession

        key = (cfg, self.backend)
        if key not in self._sessions:
            self._sessions[key] = DecoderSession(cfg, backend=self.backend)
        return self._sessions[key]

    def decode(self, clip: bytes, mode: int) -> list[bytes]:
        from .container import Demuxer

        cfg = Demuxer(clip).info.cfg
        with self._lock:
            sess = self._session(cfg)
            frames = list(sess.decode_clip(clip))
            if mode == MODE_YUV:
                return [f.yuv_bytes() for f in frames]
            from .ops.csc import frame_to_rgb

            if mode == MODE_RGB:
                return [np.asarray(frame_to_rgb(
                    f.planes, cfg.h_samp, cfg.v_samp)).tobytes()
                    for f in frames]
            # MODE_EMBED
            import jax

            from .models.vit import ViTConfig, init_vit, vit_encode
            from .ops.csc import resize_bilinear

            if self._vit is None:
                vcfg = self._vit_cfg or ViTConfig()
                self._vit = (vcfg, init_vit(vcfg, jax.random.key(0)))
            vcfg, params = self._vit
            out = []
            for f in frames:
                rgb = frame_to_rgb(f.planes, cfg.h_samp, cfg.v_samp)
                img = resize_bilinear(rgb, vcfg.image_size, vcfg.image_size)
                emb = vit_encode(params, vcfg, img[None])
                out.append(np.asarray(emb)[0].astype("<f4").tobytes())
            return out


def decode_remote(host: str, port: int, clip: bytes,
                  mode: int = MODE_YUV, timeout: float = 600.0) -> list[bytes]:
    """Client helper: submit a clip, return response chunks."""
    with socket.create_connection((host, port), timeout=timeout) as s:
        s.sendall(MAGIC_Q + struct.pack("<II", mode, len(clip)) + clip)
        head = _recv_exact(s, 12)
        if head[:4] != MAGIC_R:
            raise ValueError("bad response magic")
        status, n_chunks = struct.unpack("<II", head[4:])
        chunks = []
        for _ in range(n_chunks):
            (ln,) = struct.unpack("<I", _recv_exact(s, 4))
            chunks.append(_recv_exact(s, ln))
        if status != 0:
            raise RuntimeError(f"server error: {chunks[0].decode()}")
        return chunks


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="hvqm4_tpu.serve")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8907)
    ap.add_argument("--backend", default="jax", choices=["jax", "numpy"])
    args = ap.parse_args(argv)
    srv = DecodeServer((args.host, args.port), backend=args.backend)
    print(f"hvqm4_tpu decode service on {args.host}:{args.port} "
          f"(backend={args.backend})", file=sys.stderr)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
