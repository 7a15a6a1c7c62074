"""Native (C++) runtime components, loaded via ctypes.

The shared library is compiled on demand with the system toolchain and
cached next to the source; every entry point has a numpy fallback, so the
package works (slower) without a compiler.
"""

from audio_cut_tpu.native.loader import get_pcm_codec, native_available

__all__ = ["get_pcm_codec", "native_available"]
