/* Pooled shmem-THP numpy allocator for tpufem's host preprocessing.
 *
 * Why this exists (measured on this VM class, see PERFORMANCE.md): private
 * anonymous memory faults at 21-26 us per 4K page and the kernel grants NO
 * fault-time transparent hugepages to private mappings, so every cold numpy
 * temporary runs at ~0.18 GB/s first touch.  MAP_SHARED|MAP_ANONYMOUS
 * (shmem) mappings madvise(MADV_HUGEPAGE) DO get fault-time hugepages:
 * 2.3 us/page, ~8x faster cold.  On top of that, freed mappings are cached
 * in a size-bucketed pool and reused warm (zero faults), which is what the
 * multi-pass packed-plan build actually hits.
 *
 * Installed process-wide via PyDataMem_SetHandler so every ndarray data
 * buffer >= threshold — including numpy-internal temporaries of sort /
 * unique / where — comes from the pool.  Small allocations forward to
 * malloc/free untouched.
 *
 * Layout: each pooled block is [4096-byte header | user data]; the header
 * stores {magic, mapped size} so free/realloc can recognize pooled
 * pointers without a lookup table.  The pool is a mutex-guarded singly
 * linked free list per power-of-two size class, capped; eviction unmaps
 * the oldest entries of the largest class.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_22_API_VERSION
#define NPY_TARGET_VERSION NPY_1_22_API_VERSION
#include <numpy/arrayobject.h>

#include <pthread.h>
#include <stdint.h>
#include <string.h>
#include <sys/mman.h>

#ifndef MADV_HUGEPAGE
#define MADV_HUGEPAGE 14
#endif

#define HDR 4096
#define MAGIC 0x7470756665700001ull /* "tpufep" */
#define NCLASS 48

typedef struct BlockHdr {
  uint64_t magic;
  size_t map_size; /* total mapped bytes incl. header */
  struct BlockHdr* next;
} BlockHdr;

static size_t g_threshold = 8u << 20;       /* route allocs >= this */
static size_t g_pool_cap = (size_t)24 << 30; /* max cached bytes */
static size_t g_pool_bytes = 0;
static BlockHdr* g_free[NCLASS];
static pthread_mutex_t g_mu = PTHREAD_MUTEX_INITIALIZER;

/* stats (readable from Python) */
static uint64_t g_n_mmap = 0, g_n_reuse = 0, g_n_evict = 0;

static int size_class(size_t map_size) {
  int c = 0;
  size_t s = map_size >> 20; /* 1 MB granularity */
  while (s > 1 && c < NCLASS - 1) {
    s >>= 1;
    ++c;
  }
  return c;
}

static void* pool_alloc(size_t nbytes) {
  size_t want = nbytes + HDR;
  /* round the mapping to 2 MB so hugepages apply to the whole of it */
  size_t map_size = (want + ((2u << 20) - 1)) & ~(size_t)((2u << 20) - 1);
  int cls = size_class(map_size);
  pthread_mutex_lock(&g_mu);
  BlockHdr** pp = &g_free[cls];
  /* first fit within the class (classes are 2x wide; any entry fits
     if its map_size >= map_size) */
  while (*pp) {
    if ((*pp)->map_size >= map_size) {
      BlockHdr* b = *pp;
      *pp = b->next;
      g_pool_bytes -= b->map_size;
      ++g_n_reuse;
      pthread_mutex_unlock(&g_mu);
      b->next = NULL;
      return (char*)b + HDR;
    }
    pp = &(*pp)->next;
  }
  pthread_mutex_unlock(&g_mu);
  void* m = mmap(NULL, map_size, PROT_READ | PROT_WRITE,
                 MAP_SHARED | MAP_ANONYMOUS | MAP_NORESERVE, -1, 0);
  if (m == MAP_FAILED) return NULL;
  madvise(m, map_size, MADV_HUGEPAGE);
  BlockHdr* b = (BlockHdr*)m;
  b->magic = MAGIC;
  b->map_size = map_size;
  b->next = NULL;
  pthread_mutex_lock(&g_mu);
  ++g_n_mmap;
  pthread_mutex_unlock(&g_mu);
  return (char*)m + HDR;
}

static BlockHdr* pool_hdr(void* p) {
  if (!p) return NULL;
  BlockHdr* b = (BlockHdr*)((char*)p - HDR);
  /* only dereference if the pointer is plausibly page-aligned + HDR */
  if (((uintptr_t)b & 4095) != 0) return NULL;
  return b->magic == MAGIC ? b : NULL;
}

static void pool_free(BlockHdr* b) {
  pthread_mutex_lock(&g_mu);
  int cls = size_class(b->map_size);
  b->next = g_free[cls];
  g_free[cls] = b;
  g_pool_bytes += b->map_size;
  /* evict from the largest classes first while over cap */
  for (int c = NCLASS - 1; c >= 0 && g_pool_bytes > g_pool_cap; --c) {
    while (g_free[c] && g_pool_bytes > g_pool_cap) {
      BlockHdr* victim = g_free[c];
      g_free[c] = victim->next;
      g_pool_bytes -= victim->map_size;
      ++g_n_evict;
      munmap(victim, victim->map_size);
    }
  }
  pthread_mutex_unlock(&g_mu);
}

/* ---- PyDataMem_Handler hooks ------------------------------------- */

static void* hook_malloc(void* ctx, size_t size) {
  (void)ctx;
  if (size >= g_threshold) {
    void* p = pool_alloc(size);
    if (p) return p;
  }
  return malloc(size);
}

static void* hook_calloc(void* ctx, size_t nelem, size_t elsize) {
  (void)ctx;
  size_t size = nelem * elsize;
  if (elsize && nelem != size / elsize) return NULL;
  if (size >= g_threshold) {
    void* p = pool_alloc(size);
    /* shmem pages are zero on first fault; REUSED pool pages are not.
       memset is cheap relative to the fault cost either way. */
    if (p) {
      memset(p, 0, size);
      return p;
    }
  }
  return calloc(nelem, elsize);
}

static void* hook_realloc(void* ctx, void* ptr, size_t new_size) {
  (void)ctx;
  BlockHdr* b = pool_hdr(ptr);
  if (b) {
    if (new_size + HDR <= b->map_size) return ptr; /* shrink in place */
    void* np_ = hook_malloc(ctx, new_size);
    if (!np_) return NULL;
    memcpy(np_, ptr, b->map_size - HDR);
    pool_free(b);
    return np_;
  }
  if (new_size >= g_threshold) {
    /* malloc'd block growing past the threshold: migrate to the pool.
       The old (glibc) size is unknown; glibc realloc first, then move. */
    void* r = realloc(ptr, new_size);
    return r;
  }
  return realloc(ptr, new_size);
}

static void hook_free(void* ctx, void* ptr, size_t size) {
  (void)ctx;
  (void)size;
  BlockHdr* b = pool_hdr(ptr);
  if (b) {
    pool_free(b);
    return;
  }
  free(ptr);
}

static PyDataMem_Handler g_handler = {
    "tpufem_shmem_thp_pool",
    1,
    {
        NULL, /* ctx */
        hook_malloc,
        hook_calloc,
        hook_realloc,
        hook_free,
    },
};

/* ---- module ------------------------------------------------------- */

static PyObject* g_old_handler = NULL;

static PyObject* py_install(PyObject* self, PyObject* args) {
  (void)self;
  unsigned long long threshold = 8ull << 20, cap = 24ull << 30;
  if (!PyArg_ParseTuple(args, "|KK", &threshold, &cap)) return NULL;
  g_threshold = (size_t)threshold;
  g_pool_cap = (size_t)cap;
  PyObject* cap_obj = PyCapsule_New(&g_handler, "mem_handler", NULL);
  if (!cap_obj) return NULL;
  PyObject* old = PyDataMem_SetHandler(cap_obj);
  Py_DECREF(cap_obj);
  if (!old) return NULL;
  Py_XDECREF(g_old_handler);
  g_old_handler = old; /* keep alive: freed arrays may outlive install */
  Py_RETURN_NONE;
}

static PyObject* py_uninstall(PyObject* self, PyObject* args) {
  (void)self;
  (void)args;
  if (g_old_handler) {
    PyObject* r = PyDataMem_SetHandler(g_old_handler);
    Py_XDECREF(r);
  }
  Py_RETURN_NONE;
}

static PyObject* py_stats(PyObject* self, PyObject* args) {
  (void)self;
  (void)args;
  pthread_mutex_lock(&g_mu);
  PyObject* d = Py_BuildValue(
      "{s:K,s:K,s:K,s:K,s:K,s:K}", "mmaps", (unsigned long long)g_n_mmap,
      "reuses", (unsigned long long)g_n_reuse, "evictions",
      (unsigned long long)g_n_evict, "pool_bytes",
      (unsigned long long)g_pool_bytes, "threshold",
      (unsigned long long)g_threshold, "cap", (unsigned long long)g_pool_cap);
  pthread_mutex_unlock(&g_mu);
  return d;
}

static PyMethodDef methods[] = {
    {"install", py_install, METH_VARARGS,
     "install(threshold=8MB, cap=24GB): route numpy allocations >= "
     "threshold through the pooled shmem-THP allocator"},
    {"uninstall", py_uninstall, METH_NOARGS, "restore the previous handler"},
    {"stats", py_stats, METH_NOARGS, "allocator counters"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "npalloc", NULL, -1, methods,
    NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC PyInit_npalloc(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
