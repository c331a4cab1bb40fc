from .encode import encode_seq, decode_seq, PAD
