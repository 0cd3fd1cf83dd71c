"""Wire protocol: JSON text messages interleaved with binary fMP4 fragments.

Message vocabulary mirrors the reference exactly (reference:
src/video_server.cc:102-117 dispatch, :166-185 frameRequest/ack,
:396-401 image metadata; client side src/video_client.cc:63-74,125-146):

  client -> server:
    {"type": "text", "message": str}
    {"type": "videoRequest", "video": str}
    {"type": "frameRequest", "centerX": float, "centerY": float,
     "packetNumber": int}
  server -> client:
    {"type": "text", "message": str}
    {"type": "ack", "packetNumber": int}
    {"type": "image", "centerX": float, "centerY": float, "frameNum": int}
    <binary websocket frame: one fMP4 fragment (header first)>

frameNum wraps modulo 256 (reference: src/video_server.cc:397-402); the
image metadata echoes the gaze actually used so the client can unwarp with
the matching center.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any


@dataclasses.dataclass
class TextMessage:
    message: str
    type: str = "text"


@dataclasses.dataclass
class VideoRequest:
    video: str
    type: str = "videoRequest"


@dataclasses.dataclass
class FrameRequest:
    centerX: float
    centerY: float
    packetNumber: int
    type: str = "frameRequest"


@dataclasses.dataclass
class Ack:
    packetNumber: int
    type: str = "ack"


@dataclasses.dataclass
class FrameMeta:
    centerX: float
    centerY: float
    frameNum: int
    type: str = "image"


_BY_TYPE = {
    "text": TextMessage,
    "videoRequest": VideoRequest,
    "frameRequest": FrameRequest,
    "ack": Ack,
    "image": FrameMeta,
}


def dumps(msg: Any) -> str:
    return json.dumps(dataclasses.asdict(msg))


def loads(payload: str):
    obj = json.loads(payload)
    cls = _BY_TYPE.get(obj.get("type"))
    if cls is None:
        raise ValueError(f"unknown message type: {obj.get('type')!r}")
    fields = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in obj.items() if k in fields})
