"""Crypto kernels for encrypted PDFs (RC4, AES, standard security handler)."""
