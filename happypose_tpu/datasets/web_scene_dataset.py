"""WebDataset-style tar-shard scene storage.

Parity target: /root/reference/happypose/toolbox/datasets/
web_scene_dataset.py:54-252 (+ toolbox/utils/webdataset.py:29-66): scenes
sharded into tar files with one sample = grouped members
(<key>.rgb.png / <key>.depth.png / <key>.camera_data.json /
<key>.object_datas.json), an infinite shuffled iterator with a shuffle
buffer, and a writer. No webdataset dependency — plain tarfile.
"""

from __future__ import annotations

import io
import json
import tarfile
from pathlib import Path
from typing import Iterator, List, Sequence, Union

import numpy as np

from happypose_tpu.datasets.bop import SceneObservation


def _obs_to_members(obs: SceneObservation, key: str):
    from PIL import Image

    out = []

    def png(arr):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()

    out.append((f"{key}.rgb.png", png(obs.rgb)))
    if obs.depth is not None:
        d16 = np.clip(obs.depth * 1000.0, 0, 65535).astype(np.uint16)
        out.append((f"{key}.depth.png", png(d16)))
    cam = {"K": np.asarray(obs.K).tolist(), "TWC": np.asarray(
        obs.TWC if obs.TWC is not None else np.eye(4)).tolist()}
    out.append((f"{key}.camera_data.json", json.dumps(cam).encode()))
    objs = []
    if obs.obj_labels is not None:
        for j, label in enumerate(obs.obj_labels):
            objs.append(
                {
                    "label": label,
                    "TWO": np.asarray(obs.TWO[j]).tolist(),
                    "bbox": np.asarray(obs.bboxes[j]).tolist(),
                    "visib_fract": float(
                        obs.visib_fract[j] if obs.visib_fract is not None
                        else 1.0
                    ),
                }
            )
    out.append((f"{key}.object_datas.json", json.dumps(objs).encode()))
    return out


def write_scene_ds_as_wds(
    observations: Sequence[SceneObservation],
    out_dir: Union[str, Path],
    shard_size: int = 64,
    prefix: str = "shard",
) -> List[Path]:
    """Write observations into tar shards; returns shard paths."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = []
    for s in range(0, len(observations), shard_size):
        path = out_dir / f"{prefix}-{s // shard_size:06d}.tar"
        with tarfile.open(path, "w") as tar:
            for i, obs in enumerate(observations[s : s + shard_size]):
                key = f"{s + i:08d}"
                for name, payload in _obs_to_members(obs, key):
                    info = tarfile.TarInfo(name)
                    info.size = len(payload)
                    tar.addfile(info, io.BytesIO(payload))
        paths.append(path)
    return paths


def _members_to_obs(members: dict, key: str) -> SceneObservation:
    from PIL import Image

    rgb = np.asarray(Image.open(io.BytesIO(members[f"{key}.rgb.png"])))
    cam = json.loads(members[f"{key}.camera_data.json"])
    objs = json.loads(members[f"{key}.object_datas.json"])
    depth = None
    if f"{key}.depth.png" in members:
        depth = (
            np.asarray(
                Image.open(io.BytesIO(members[f"{key}.depth.png"]))
            ).astype(np.float32)
            / 1000.0
        )
    kw = dict(
        rgb=rgb,
        K=np.asarray(cam["K"], np.float32),
        TWC=np.asarray(cam["TWC"], np.float32),
        depth=depth,
    )
    if objs:
        kw.update(
            obj_labels=[o["label"] for o in objs],
            TWO=np.stack([np.asarray(o["TWO"], np.float32) for o in objs]),
            bboxes=np.stack([np.asarray(o["bbox"], np.float32) for o in objs]),
            visib_fract=np.asarray([o["visib_fract"] for o in objs], np.float32),
        )
    return SceneObservation(**kw)


class WebSceneDataset:
    """Random-access reader over a directory of tar shards."""

    def __init__(self, shards_dir: Union[str, Path]):
        self.paths = sorted(Path(shards_dir).glob("*.tar"))
        self.index: List[tuple] = []  # (path_idx, key)
        for pi, p in enumerate(self.paths):
            with tarfile.open(p) as tar:
                keys = sorted(
                    {m.name.split(".")[0] for m in tar.getmembers()}
                )
            for k in keys:
                self.index.append((pi, k))

    def __len__(self) -> int:
        return len(self.index)

    def __getitem__(self, i: int) -> SceneObservation:
        pi, key = self.index[i]
        with tarfile.open(self.paths[pi]) as tar:
            members = {
                m.name: tar.extractfile(m).read()
                for m in tar.getmembers()
                if m.name.startswith(key + ".")
            }
        return _members_to_obs(members, key)


class IterableWebSceneDataset:
    """Infinite shuffled stream with a shuffle buffer (sequential tar reads;
    the training-side iterator of the reference)."""

    def __init__(self, shards_dir: Union[str, Path], buffer_size: int = 32,
                 seed: int = 0):
        self.paths = sorted(Path(shards_dir).glob("*.tar"))
        self.buffer_size = buffer_size
        self.seed = seed

    def _stream(self, rng) -> Iterator[SceneObservation]:
        while True:
            order = rng.permutation(len(self.paths))
            for pi in order:
                with tarfile.open(self.paths[pi]) as tar:
                    groups: dict = {}
                    for m in tar.getmembers():
                        key = m.name.split(".")[0]
                        groups.setdefault(key, {})[m.name] = tar.extractfile(
                            m
                        ).read()
                    for key in sorted(groups):
                        yield _members_to_obs(groups[key], key)

    def __iter__(self) -> Iterator[SceneObservation]:
        rng = np.random.RandomState(self.seed)
        buf: List[SceneObservation] = []
        for obs in self._stream(rng):
            buf.append(obs)
            if len(buf) >= self.buffer_size:
                i = rng.randint(len(buf))
                yield buf.pop(i)
