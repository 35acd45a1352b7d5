"""Timestamp normalization and field targeting (reference L3).

Ports the monotonic-clock repair of the demux pump
(ffmpeg_to_composite.cpp:2249-2293) and the PTS->target rules of the
decode-render functions (:1663-1678 video, :1816-1829 audio), plus
normalize_ts.cpp's per-stream monotonic rewrite (:171-188, :438-467).
"""

from __future__ import annotations

import dataclasses
from fractions import Fraction


@dataclasses.dataclass
class TimestampNormalizer:
    """Monotonic master clock: feeds on packet times (seconds), returns the
    adjusted time, compensating backward jumps >1.5s and forward jumps >5s
    (DVD timecode resets / breaks)."""

    backward_slack: float = 1.5
    forward_slack: float = 5.0
    adj_time: float = 0.0
    prev_t: float = -1.0

    def feed(self, t: float) -> float:
        if self.prev_t < 0:
            self.adj_time = -t
        elif (t + self.backward_slack) < self.prev_t:
            self.adj_time += self.prev_t - t
        elif t > (self.prev_t + self.forward_slack):
            self.adj_time += self.prev_t - t
        self.prev_t = t
        return t + self.adj_time


def video_target_field(pts_field, current_field: int, slack: int = 4) -> int:
    """Clamp decoder PTS imperfections (ffmpeg_to_composite.cpp:1663-1678):
    None -> current; negative -> 0; small backwards jitter -> hold."""
    if pts_field is None:
        return current_field
    tgt = max(0, int(pts_field))
    if abs(tgt - current_field) < slack and tgt < current_field:
        tgt = current_field
    return tgt


def audio_target_sample(pts_sample, current_sample: int, rate: int) -> int:
    """Same rule with rate/30 slack (:1816-1829)."""
    if pts_sample is None:
        return current_sample
    tgt = max(0, int(pts_sample))
    if abs(tgt - current_sample) < rate // 30 and tgt < current_sample:
        tgt = current_sample
    return tgt


def frame_pts_to_field(frame_index: int, fps: Fraction, field_rate: Fraction) -> int:
    """Rescale a frame timestamp into the running field counter (the
    av_packet_rescale_ts to field timebase at :2300-2301). av_rescale's
    default AV_ROUND_NEAR_INF rounds half away from zero — truncation
    changes the pull-down cadence for rates that don't divide the field
    rate (24/25/48 fps into 59.94)."""
    q = Fraction(frame_index) * field_rate / fps
    n, d = q.numerator, q.denominator
    if n >= 0:
        return (2 * n + d) // (2 * d)
    return -((2 * -n + d) // (2 * d))


@dataclasses.dataclass
class StreamTsState:
    """normalize_ts.cpp per-stream monotonic PTS rewrite (:171-188,438-467)."""

    prev_pts: int | None = None
    add: int = 0
    max_forward: int = 0  # in stream timebase ticks; 0 = no clamp

    def rewrite(self, pts: int | None) -> int | None:
        if pts is None:
            return None
        p = pts + self.add
        if self.prev_pts is not None:
            if p < self.prev_pts:
                self.add += self.prev_pts - p
                p = self.prev_pts
            elif self.max_forward and p > self.prev_pts + self.max_forward:
                self.add -= p - (self.prev_pts + self.max_forward)
                p = self.prev_pts + self.max_forward
        self.prev_pts = p
        return p
