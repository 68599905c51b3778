"""L3 archive drivers: container parsing on host, codecs for the bytes."""
