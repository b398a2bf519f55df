"""Minimal, dependency-free safetensors reader/writer.

Implemented from the public format spec (8-byte little-endian header length,
JSON header with ``{name: {dtype, shape, data_offsets}}``, then raw tensor
bytes). Reasons to own this instead of wrapping the ``safetensors`` package:

* BF16 / FP8 tensors round-trip through ``ml_dtypes`` numpy arrays with no
  torch dependency anywhere in the save/load path;
* :class:`LazySafetensors` memory-maps shards and materializes one tensor at
  a time — the backbone of the shard-streaming data-free PTQ path and the
  weight-recombination tool (reference analogs:
  ``scripts/quant_GLM-4.7-Flash-FP8.py`` and
  ``scripts/recombine_weights_MiniMax-M2.1.py`` which bound residency to 2
  shards);
* sharded writes emit the standard ``model.safetensors.index.json`` exactly
  as HF/vLLM expect.
"""

from __future__ import annotations

import json
import mmap
import os
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional, Tuple, Union

import ml_dtypes
import numpy as np

# safetensors dtype tag <-> numpy dtype (ml_dtypes supplies the narrow floats)
_DTYPES: Dict[str, Any] = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": ml_dtypes.bfloat16,
    "F8_E4M3": ml_dtypes.float8_e4m3fn,
    "F8_E5M2": ml_dtypes.float8_e5m2,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "U16": np.uint16,
    "U32": np.uint32,
    "U64": np.uint64,
    "BOOL": np.bool_,
}
_TO_TAG = {np.dtype(v): k for k, v in _DTYPES.items()}


def dtype_tag(arr: np.ndarray) -> str:
    try:
        return _TO_TAG[arr.dtype]
    except KeyError:
        raise ValueError(f"Unsupported dtype for safetensors: {arr.dtype}") from None


def write_safetensors(
    path: Union[str, Path],
    tensors: Dict[str, np.ndarray],
    metadata: Optional[Dict[str, str]] = None,
) -> None:
    """Write one .safetensors file. Tensor bytes are laid out in insertion
    order; offsets are 8-byte aligned via header padding (spec-compliant)."""
    header: Dict[str, Any] = {}
    if metadata:
        header["__metadata__"] = {str(k): str(v) for k, v in metadata.items()}

    offset = 0
    blobs: List[bytes] = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        raw = arr.tobytes()
        header[name] = {
            "dtype": dtype_tag(arr),
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(raw)],
        }
        blobs.append(raw)
        offset += len(raw)

    hjson = json.dumps(header, separators=(",", ":")).encode()
    pad = (-(8 + len(hjson))) % 8
    hjson += b" " * pad

    with open(path, "wb") as f:
        f.write(len(hjson).to_bytes(8, "little"))
        f.write(hjson)
        for raw in blobs:
            f.write(raw)


def _parse_header(buf: memoryview) -> Tuple[Dict[str, Any], int]:
    hlen = int.from_bytes(buf[:8], "little")
    header = json.loads(bytes(buf[8 : 8 + hlen]).decode())
    return header, 8 + hlen


class LazySafetensors:
    """Memory-mapped single-file reader; tensors materialize on access."""

    def __init__(self, path: Union[str, Path]):
        self.path = Path(path)
        self._file = open(self.path, "rb")
        self._mm = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        header, self._base = _parse_header(memoryview(self._mm))
        self.metadata: Dict[str, str] = header.pop("__metadata__", {})
        self._entries: Dict[str, Any] = header

    def keys(self) -> List[str]:
        return list(self._entries)

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def info(self, name: str) -> Tuple[str, Tuple[int, ...]]:
        e = self._entries[name]
        return e["dtype"], tuple(e["shape"])

    def get(self, name: str) -> np.ndarray:
        e = self._entries[name]
        start, end = e["data_offsets"]
        raw = self._mm[self._base + start : self._base + end]
        arr = np.frombuffer(raw, dtype=_DTYPES[e["dtype"]])
        return arr.reshape(e["shape"])

    def items(self) -> Iterator[Tuple[str, np.ndarray]]:
        for name in self._entries:
            yield name, self.get(name)

    def close(self) -> None:
        self._mm.close()
        self._file.close()

    def __enter__(self) -> "LazySafetensors":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.close()


def read_safetensors(path: Union[str, Path]) -> Dict[str, np.ndarray]:
    """Eagerly load every tensor (copies out of the mmap)."""
    with LazySafetensors(path) as f:
        return {k: np.array(v) for k, v in f.items()}


# ---------------------------------------------------------------------------
# sharded checkpoints (HF layout: model-XXXXX-of-YYYYY.safetensors + index)
# ---------------------------------------------------------------------------

INDEX_NAME = "model.safetensors.index.json"


class ShardedWriter:
    """Accumulate tensors and write size-bounded shards + the index JSON."""

    def __init__(
        self,
        out_dir: Union[str, Path],
        max_shard_bytes: int = 5 * 1024**3,
        base_name: str = "model",
    ):
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.max_shard_bytes = max_shard_bytes
        self.base_name = base_name
        self._current: Dict[str, np.ndarray] = {}
        self._current_bytes = 0
        self._shards: List[Dict[str, np.ndarray]] = []

    def add(self, name: str, arr: np.ndarray) -> None:
        nbytes = int(np.ascontiguousarray(arr).nbytes)
        if self._current and self._current_bytes + nbytes > self.max_shard_bytes:
            self._shards.append(self._current)
            self._current, self._current_bytes = {}, 0
        self._current[name] = arr
        self._current_bytes += nbytes

    def add_many(self, tensors: Dict[str, np.ndarray]) -> None:
        for k, v in tensors.items():
            self.add(k, v)

    def finalize(self, metadata: Optional[Dict[str, str]] = None) -> List[str]:
        if self._current:
            self._shards.append(self._current)
            self._current, self._current_bytes = {}, 0

        n = len(self._shards)
        weight_map: Dict[str, str] = {}
        total = 0
        files: List[str] = []

        if n == 1:
            fname = f"{self.base_name}.safetensors"
            write_safetensors(self.out_dir / fname, self._shards[0], metadata)
            files.append(fname)
            # single-file checkpoints conventionally skip the index, but we
            # still write one: vLLM and HF both tolerate it and the
            # recombination tool keys off it.
            for k, v in self._shards[0].items():
                weight_map[k] = fname
                total += int(np.ascontiguousarray(v).nbytes)
        else:
            for i, shard in enumerate(self._shards, start=1):
                fname = f"{self.base_name}-{i:05d}-of-{n:05d}.safetensors"
                write_safetensors(self.out_dir / fname, shard, metadata)
                files.append(fname)
                for k, v in shard.items():
                    weight_map[k] = fname
                    total += int(np.ascontiguousarray(v).nbytes)

        index = {"metadata": {"total_size": total}, "weight_map": weight_map}
        with open(self.out_dir / INDEX_NAME, "w") as f:
            json.dump(index, f, indent=2, sort_keys=True)
        self._shards = []
        return files


class ShardedReader:
    """Read an HF-layout checkpoint directory with bounded shard residency.

    Keeps at most ``max_open_shards`` mmap'd files alive (LRU), the TPU-side
    equivalent of the reference merger's 2-file LRU
    (``recombine_weights_MiniMax-M2.1.py:26,208-222``).
    """

    def __init__(self, ckpt_dir: Union[str, Path], max_open_shards: int = 2):
        self.dir = Path(ckpt_dir)
        self.max_open = max_open_shards
        self._open: Dict[str, LazySafetensors] = {}

        index_path = self.dir / INDEX_NAME
        if index_path.exists():
            with open(index_path) as f:
                self.weight_map: Dict[str, str] = json.load(f)["weight_map"]
        else:
            files = sorted(p.name for p in self.dir.glob("*.safetensors"))
            if not files:
                raise FileNotFoundError(f"No safetensors files in {self.dir}")
            self.weight_map = {}
            for fname in files:
                with LazySafetensors(self.dir / fname) as lf:
                    for k in lf.keys():
                        self.weight_map[k] = fname

    def keys(self) -> List[str]:
        return list(self.weight_map)

    def __contains__(self, name: str) -> bool:
        return name in self.weight_map

    def _shard(self, fname: str) -> LazySafetensors:
        if fname in self._open:
            return self._open[fname]
        if len(self._open) >= self.max_open:
            oldest = next(iter(self._open))
            self._open.pop(oldest).close()
        lf = LazySafetensors(self.dir / fname)
        self._open[fname] = lf
        return lf

    def get(self, name: str) -> np.ndarray:
        return self._shard(self.weight_map[name]).get(name)

    def iter_shards(self) -> Iterator[Tuple[str, LazySafetensors]]:
        """Yield (file_name, open_shard) in natural order — the streaming
        loop of the data-free quantizer."""
        for fname in sorted(set(self.weight_map.values()), key=natural_sort_key):
            yield fname, self._shard(fname)

    def close(self) -> None:
        for lf in self._open.values():
            lf.close()
        self._open = {}

    def __enter__(self) -> "ShardedReader":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.close()


def natural_sort_key(s: str) -> List[Any]:
    """Human-friendly ordering for shard file names."""
    import re

    return [int(part) if part.isdigit() else part.casefold() for part in re.split(r"(\d+)", s)]


def jax_to_numpy(arr: Any) -> np.ndarray:
    """Convert a JAX array (incl. bf16/fp8) to a serializable numpy array."""
    out = np.asarray(arr)
    return out


def load_json(path: Union[str, Path]) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def dump_json(obj: Any, path: Union[str, Path]) -> None:
    with open(path, "w") as f:
        json.dump(obj, f, indent=2, sort_keys=True)
        f.write(os.linesep)
