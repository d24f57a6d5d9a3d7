from .pages import generate_pages, write_pages, load_pages, extract_text_bytes, wrap_html

__all__ = ["generate_pages", "write_pages", "load_pages", "extract_text_bytes", "wrap_html"]
