"""Length-bucketing policy.

XLA compiles one program per distinct input shape; dynamic sentence/mel
lengths therefore get padded up to a small fixed set of buckets so the
whole serving workload runs against a handful of cached executables
(SURVEY.md §7 step 5 — this is where the >=100x RTF target is won).
"""

import bisect
import typing
from dataclasses import dataclass


def _round_up(x: int, multiple: int) -> int:
    return -(-x // multiple) * multiple


@dataclass(frozen=True)
class BucketPolicy:
    """Static shape grid for the three synthesis stages."""

    # phoneme-length buckets (encoder stage)
    text_buckets: typing.Tuple[int, ...] = (16, 32, 64, 96, 128, 192, 256, 384)
    # mel-frame buckets (flow decoder + vocoder stages); multiples of n_sqz
    mel_buckets: typing.Tuple[int, ...] = (
        64, 128, 256, 384, 512, 768, 1024, 1536, 2048, 3072, 4096,
    )
    # batch-size buckets (smallest >= n is used, padded with dummy rows)
    batch_buckets: typing.Tuple[int, ...] = (1, 2, 4, 8, 16)
    n_sqz: int = 2

    def text_bucket(self, length: int) -> int:
        i = bisect.bisect_left(self.text_buckets, length)
        if i < len(self.text_buckets):
            return self.text_buckets[i]
        return _round_up(length, self.text_buckets[-1])

    def mel_bucket(self, frames: int) -> int:
        frames = _round_up(max(frames, self.n_sqz), self.n_sqz)
        i = bisect.bisect_left(self.mel_buckets, frames)
        if i < len(self.mel_buckets):
            return self.mel_buckets[i]
        # Beyond the grid, stay within ~12% padding: every mel frame costs
        # 256 audio samples of vocoder compute AND of device->host transfer
        # (the tunnel link runs ~40 MB/s — padding is pure loss there).
        return _round_up(frames, 512)

    def batch_bucket(self, n: int) -> int:
        i = bisect.bisect_left(self.batch_buckets, n)
        if i < len(self.batch_buckets):
            return self.batch_buckets[i]
        return _round_up(n, self.batch_buckets[-1])

    def group_by_text_bucket(
        self, lengths: typing.Sequence[int], max_batch: int
    ) -> typing.List[typing.List[int]]:
        """Group item indices by text bucket, splitting groups at max_batch.

        Returns groups ordered by first occurrence so results stream roughly
        in input order.
        """
        groups: typing.Dict[int, typing.List[int]] = {}
        order: typing.List[int] = []
        for idx, length in enumerate(lengths):
            b = self.text_bucket(length)
            if b not in groups:
                groups[b] = []
                order.append(b)
            groups[b].append(idx)
        out: typing.List[typing.List[int]] = []
        for b in order:
            items = groups[b]
            for i in range(0, len(items), max_batch):
                out.append(items[i : i + max_batch])
        return out
