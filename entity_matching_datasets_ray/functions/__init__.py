"""Pure (Ray-free) kernel libraries: normalizers, similarity, hashing, text."""
