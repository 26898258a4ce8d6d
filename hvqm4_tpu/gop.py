"""GOP structure helpers: display-order patterns ↔ decode order."""

from __future__ import annotations


def reorder_display_to_decode(pattern: str) -> list[tuple[str, int]]:
    """Display-order pattern like 'IBBPBP' → decode-order [(ftype, display_id)].

    Classic MPEG-style rule: an anchor (I/P) is decoded before the B frames
    that precede it in display order.
    """
    out: list[tuple[str, int]] = []
    pending_b: list[int] = []
    for disp, f in enumerate(pattern):
        if f == "B":
            pending_b.append(disp)
        else:
            out.append((f, disp))
            for b in pending_b:
                out.append(("B", b))
            pending_b = []
    for b in pending_b:  # trailing Bs (encoders avoid, but handle)
        out.append(("B", b))
    return out
