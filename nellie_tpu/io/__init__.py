"""Host-side IO: TIFF/OME codecs, metadata, and the artifact store."""

from nellie_tpu.io.verifier import FileInfo, ImInfo  # noqa: F401
