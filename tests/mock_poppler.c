/* Minimal mock of the poppler-glib C ABI for PDF-binding tests.
 *
 * Implements just the five functions timg_tpu/sources/pdf_source.py
 * binds, with deterministic behavior:
 *   - a "document" opens iff the file exists and starts with "%PDF"
 *   - 3 pages, each 200x100 points
 *   - poppler_page_render fills the left half of the page with blue
 *     and a 20x20 red square at the page origin (drawn through the
 *     real cairo, so the scale/translate transform the binding sets up
 *     is exercised end to end)
 *   - poppler_page_get_bounding_box reports a 100x50 box at (50, 25)
 *     (exercises the auto-crop translate path)
 *
 * Built on demand by tests/test_pdf.py:
 *   gcc -shared -fPIC -o libpoppler_mock.so mock_poppler.c
 * and selected via TIMG_POPPLER_GLIB_LIB.  g_object_unref comes from
 * the real libgobject, cairo from the real libcairo (no headers needed:
 * the few cairo calls are declared extern here).
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* real cairo, linked at load time through the python process */
extern void cairo_set_source_rgb(void *cr, double r, double g, double b);
extern void cairo_rectangle(void *cr, double x, double y, double w, double h);
extern void cairo_fill(void *cr);

typedef struct {
    double x1, y1, x2, y2;
} PopplerRectangle;

static int mock_document = 42;
static int mock_pages[3] = {0, 1, 2};

void *poppler_document_new_from_file(const char *uri, const char *password,
                                     void **error) {
    (void)password;
    (void)error;
    if (strncmp(uri, "file://", 7) != 0) return NULL;
    FILE *f = fopen(uri + 7, "rb");
    if (!f) return NULL;
    char magic[4] = {0};
    size_t n = fread(magic, 1, 4, f);
    fclose(f);
    if (n != 4 || strncmp(magic, "%PDF", 4) != 0) return NULL;
    return &mock_document;
}

int poppler_document_get_n_pages(void *doc) {
    return doc == &mock_document ? 3 : 0;
}

void *poppler_document_get_page(void *doc, int n) {
    if (doc != &mock_document || n < 0 || n >= 3) return NULL;
    return &mock_pages[n];
}

void poppler_page_get_size(void *page, double *w, double *h) {
    (void)page;
    *w = 200.0;
    *h = 100.0;
}

int poppler_page_get_bounding_box(void *page, PopplerRectangle *rect) {
    (void)page;
    rect->x1 = 50.0;
    rect->y1 = 25.0;
    rect->x2 = 150.0;
    rect->y2 = 75.0;
    return 1;
}

/* Mock handles are static ints, not GObjects: unref must be a no-op.
 * The binding prefers this symbol from the poppler handle when present. */
void g_object_unref(void *obj) { (void)obj; }

void poppler_page_render(void *page, void *cr) {
    (void)page;
    /* left half blue */
    cairo_set_source_rgb(cr, 0.0, 0.0, 1.0);
    cairo_rectangle(cr, 0.0, 0.0, 100.0, 100.0);
    cairo_fill(cr);
    /* red square at origin */
    cairo_set_source_rgb(cr, 1.0, 0.0, 0.0);
    cairo_rectangle(cr, 0.0, 0.0, 20.0, 20.0);
    cairo_fill(cr);
}
