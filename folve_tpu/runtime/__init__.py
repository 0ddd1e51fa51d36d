"""Host streaming runtime: handlers, caches, buffers, prefetch."""

from folve_tpu.runtime.buffer_thread import BufferThread
from folve_tpu.runtime.conversion_buffer import ConversionBuffer
from folve_tpu.runtime.filesystem import FolveFilesystem
from folve_tpu.runtime.handler import (
    ConvolveFileHandler,
    FileHandler,
    FileStat,
    HandlerStats,
    PassThroughHandler,
    Status,
)
from folve_tpu.runtime.handler_cache import FileHandlerCache, Observer
from folve_tpu.runtime.pool import ProcessorPool
from folve_tpu.runtime.processor import SoundProcessor

__all__ = [
    "BufferThread",
    "ConversionBuffer",
    "FolveFilesystem",
    "ConvolveFileHandler",
    "FileHandler",
    "FileStat",
    "HandlerStats",
    "PassThroughHandler",
    "Status",
    "FileHandlerCache",
    "Observer",
    "ProcessorPool",
    "SoundProcessor",
]
