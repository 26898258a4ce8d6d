"""Training-data loader: `.h4m` corpora → on-device RGB batches.

The consumer-facing face of BASELINE config 5 for ML jobs: iterate batches
of decoded RGB frames (optionally resized) without the pixels ever visiting
the host. Built on the multi-stream decoder, so N clips decode in lock-step
on one chip and shard across chips via a mesh.

Two iteration modes with DIFFERENT yield types:

- default (`display_order=False`) — lock-step batches in decode order:
  every item is `(rgb, valid)` where rgb is `(N, H', W', 3)` f32 [0,1] and
  valid is the per-stream liveness list (mask finished/poisoned streams,
  e.g. as loss weights — see examples/train_vit.py):

      loader = FrameBatchLoader(cfg, clips, image_size=224)
      for rgb, valid in loader:
          loss = train_step(params, rgb, valid)

- `display_order=True` — presentation-ordered frames, which are ragged by
  nature (B-frames decode ahead of their display slot): every item is a
  non-empty list of `(stream_idx, frame)` pairs, where frame is one
  stream's `(H', W', 3)` image; buffering costs up to one GOP of device
  memory per stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import SeqConfig
from .ops.csc import frame_to_rgb, resize_bilinear
from .parallel.multistream import MultiStreamDecoder, shard_streams


class FrameBatchLoader:
    def __init__(self, cfg: SeqConfig, clips: list[bytes],
                 image_size: int | None = None, planner_factory=None,
                 mesh=None, display_order: bool = False):
        self.cfg = cfg
        if planner_factory is None:
            from .planner import default_planner_factory

            planner_factory = default_planner_factory()
        sharding = shard_streams(mesh, "dp") if mesh is not None else None
        self.decoder = MultiStreamDecoder(cfg, clips,
                                          planner_factory=planner_factory,
                                          sharding=sharding)
        self.display_order = display_order
        h_samp, v_samp = cfg.h_samp, cfg.v_samp

        @jax.jit
        def to_rgb(frames):
            rgb = frame_to_rgb(frames, h_samp, v_samp)
            if image_size is not None:
                rgb = jax.vmap(lambda im: resize_bilinear(
                    im, image_size, image_size))(rgb)
            else:
                rgb = rgb.astype(jnp.float32) / 255.0
            return rgb

        self._to_rgb = to_rgb

    def __iter__(self):
        if not self.display_order:
            for frames, _metas, valid in self.decoder.run_pipelined():
                yield self._to_rgb(frames), valid
            return
        # display-order: hold back per-stream until ids are contiguous
        pending = [dict() for _ in range(self.decoder.n)]
        nxt = [None] * self.decoder.n
        for frames, metas, valid in self.decoder.run_pipelined():
            batch = self._to_rgb(frames)
            ready: list[tuple[int, jnp.ndarray]] = []
            for si, (m, ok) in enumerate(zip(metas, valid)):
                if not ok:
                    continue
                if nxt[si] is None:
                    nxt[si] = m.display_id
                pending[si][m.display_id] = batch[si]
                while nxt[si] in pending[si]:
                    ready.append((si, pending[si].pop(nxt[si])))
                    nxt[si] += 1
            if ready:
                yield ready
        for si in range(self.decoder.n):
            for disp in sorted(pending[si]):
                yield [(si, pending[si].pop(disp))]
