"""User-facing model layer: the gate API and composite encrypted circuits."""
from . import api, circuits, gates, integers, processor  # noqa: F401
from .api import Context, Ctxt, decrypt_bits, encrypt_bits  # noqa: F401
from .integers import (IntCodec, IntContext, IntCtxt,  # noqa: F401
                       decrypt_int, decrypt_uint, encrypt_int, encrypt_uint)
