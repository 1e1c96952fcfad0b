"""Reference-layout alias: nellie_tpu.im_info.verifier == nellie_tpu.io.verifier.

Users of the reference import ``nellie.im_info.verifier``; this module
keeps that path working s/nellie/nellie_tpu/.
"""
from nellie_tpu.io.verifier import FileInfo, ImInfo  # noqa: F401
