"""Websocket serving: the streaming session layer."""

from foveax.serve.protocol import Ack, FrameMeta, FrameRequest, TextMessage, VideoRequest
from foveax.serve.server import FoveaxServer
from foveax.serve.client import FoveaxClient, ClientStats

__all__ = [
    "Ack",
    "FrameMeta",
    "FrameRequest",
    "TextMessage",
    "VideoRequest",
    "FoveaxServer",
    "FoveaxClient",
    "ClientStats",
]
