/**
 * Tracks whether any descendant still has time-limited content to play —
 * how <SlideShow/> knows a slide is finished and offline outputs know when
 * to send EOS.
 */
import { createContext, useContext, useEffect, useState } from 'react';
import { useAfterTimestamp } from '../hooks.js';

export class ChildrenLifetimeContext {
  private refs = new Set<symbol>();
  private onChange: () => void;

  constructor(onChange: () => void) {
    this.onChange = onChange;
  }

  public addRef(ref: symbol): void {
    this.refs.add(ref);
    this.onChange();
  }

  public removeRef(ref: symbol): void {
    this.refs.delete(ref);
    this.onChange();
  }

  public isDone(): boolean {
    return this.refs.size === 0;
  }
}

export const ChildrenLifetimeContextType = createContext(
  new ChildrenLifetimeContext(() => undefined)
);

/** Keeps the surrounding lifetime context alive until `timestamp`. */
export function useTimeLimitedComponent(timestamp: number): void {
  const lifetimeCtx = useContext(ChildrenLifetimeContextType);
  const after = useAfterTimestamp(timestamp);
  const [ref, setRef] = useState<symbol>();
  useEffect(() => {
    const newRef = Symbol();
    setRef(newRef);
    lifetimeCtx.addRef(newRef);
    return () => lifetimeCtx.removeRef(newRef);
  }, [timestamp]);
  useEffect(() => {
    if (ref && after) {
      lifetimeCtx.removeRef(ref);
    }
  }, [after, ref]);
}

/** Keeps the surrounding lifetime context alive until `completed`. */
export function useCompletableComponent(completed: boolean): void {
  const lifetimeCtx = useContext(ChildrenLifetimeContextType);
  const [ref, setRef] = useState<symbol>();
  useEffect(() => {
    const newRef = Symbol();
    setRef(newRef);
    lifetimeCtx.addRef(newRef);
    return () => lifetimeCtx.removeRef(newRef);
  }, []);
  useEffect(() => {
    if (ref && completed) {
      lifetimeCtx.removeRef(ref);
    }
  }, [completed, ref]);
}
