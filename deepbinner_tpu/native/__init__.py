"""Native (C++) runtime components: libhdf5 fast5 batch reader."""
