from .fastx import read_fasta, read_fastx, write_fasta
