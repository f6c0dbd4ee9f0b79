"""Opening book: symmetry-aware position graph built from batched search.

The role of the reference's `cpp/book/` (Book/BookHash, book.h:10-38, HTML
export bookcssjs.cpp) + `cpp/command/genbook.cpp`."""

from katacoffee_tpu.book.book import Book, BookNode, build_book

__all__ = ["Book", "BookNode", "build_book"]
