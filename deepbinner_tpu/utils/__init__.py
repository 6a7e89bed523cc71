"""Host-side utilities: sequence I/O, call tables, fast5 reading, logging."""
